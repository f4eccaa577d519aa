"""Quality A/B on the reference's real HSC+HST cutouts (the
multiresolution tutorial config): object-tree `Blend.fit` vs the batched
`MultiResFitter`, with and without in-program box growth
(`box_grow=0.1`), at equal iteration budgets.

Round-3 finding being attacked: the batched 2-source fit was ~3% worse
logL than the object tree precisely because the object tree GROWS its
source boxes mid-fit (multires.py module note).  Run on CPU:

    python tools/multires_grow_ab.py [n_iter]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import scarlet_tpu as st
    from scarlet_tpu.parallel import MultiResFitter, multires_init
    from scarlet_tpu.utils.fits import read_fits

    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    REF_DATA = "/root/reference/data/test_resampling"

    hsc, _, wcs_hsc = read_fits(os.path.join(REF_DATA, "Cut_HSC.fits"))
    hst, _, wcs_hst = read_fits(os.path.join(REF_DATA, "Cut_HST.fits"))
    psf_hsc, _, _ = read_fits(os.path.join(REF_DATA, "PSF_HSC.fits"))
    psf_hst, _, _ = read_fits(os.path.join(REF_DATA, "PSF_HST.fits"))

    def make_obs():
        obs_hsc = st.Observation(hsc, wcs=wcs_hsc, psf=st.ImagePSF(psf_hsc),
                                 channels=["g", "r", "i", "z", "y"])
        obs_hst = st.Observation(hst[None], wcs=wcs_hst,
                                 psf=st.ImagePSF(psf_hst[None]),
                                 channels=["F814W"])
        frame = st.Frame.from_observations([obs_hsc, obs_hst],
                                           coverage="intersection")
        return frame, obs_hsc, obs_hst

    frame, obs_hsc, obs_hst = make_obs()
    sky = [obs_hst.get_sky_coord((118.0, 134.0)),
           obs_hst.get_sky_coord((42.0, 167.0))]

    # ---- object tree (grows boxes via UpdateException warm restarts) ----
    srcs = [st.CompactExtendedSource(frame, s, [obs_hsc, obs_hst])
            for s in sky]
    blend = st.Blend(srcs, [obs_hsc, obs_hst])
    t0 = time.perf_counter()
    it, logL_tree = blend.fit(n_iter, e_rel=1e-8)
    t_tree = time.perf_counter() - t0
    boxes = [tuple(c.bbox.shape[-2:]) for s in blend.sources
             for c in [s]]
    print(f"object tree: it={it} logL={float(logL_tree):,.0f} "
          f"({t_tree:.1f}s) boxes={boxes}")

    # ---- batched fitter at the same centers/budget ----
    centers = np.asarray([
        np.asarray(frame.get_pixel(s), float)[:2] for s in sky])[None]
    d_hst = np.asarray(hst, np.float32)[None][None]
    d_hsc = np.asarray(hsc, np.float32)[None]
    w_hst = np.full_like(d_hst, 1.0)
    w_hsc = np.full_like(d_hsc, 1.0)
    obs = (obs_hst, obs_hsc)

    for box, grow in ((61, None), (61, 0.1), (81, 0.1)):
        fitter = MultiResFitter(obs, box_size=box, e_rel=1e-8,
                                box_grow=grow)
        init = multires_init(obs, (d_hst, d_hsc), centers,
                             box_size=box, n_slots=2)
        t0 = time.perf_counter()
        seds, morphs, loss, iters, losses = fitter.fit(
            (d_hst, d_hsc), (w_hst, w_hsc), *init, n_iter=n_iter)
        dt = time.perf_counter() - t0
        logL = float(-np.asarray(loss)[0] - fitter.log_norm((w_hst,
                                                             w_hsc))[0])
        halves = (None if fitter.last_box_half_ is None
                  else fitter.last_box_half_[0].tolist())
        print(f"batched box={box} grow={grow}: it={int(iters[0])} "
              f"logL={logL:,.0f} ({dt:.1f}s) halves={halves} "
              f"vs tree {logL - float(logL_tree):+,.0f}")


if __name__ == "__main__":
    main()
