"""TPU smoke + timing of the MAIN model-tree paths (the bench covers the
lite engine only): a full Blend fit on the real HSC blend, and a joint
multi-resolution (ResolutionRenderer) fit, both executed on the TPU chip
with CPU-pinned initialization (host-side init uses odd FFT shapes the
TPU backend rejects; the fit programs use even shapes throughout).

Run on the TPU:  python tools/tpu_smoke_main_path.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/scarlet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main_path():
    import scarlet_tpu as st

    data = np.load("/root/reference/data/hsc_cosmos_35.npz",
                   allow_pickle=True)
    images = data["images"].astype(np.float32)
    weights = (1 / np.maximum(data["variance"], 1e-12)).astype(np.float32)
    channels = list("grizy")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        frame = st.Frame(images.shape, channels=channels,
                         psf=st.GaussianPSF(sigma=0.8, boxsize=15))
        obs = st.Observation(images,
                             psf=st.ImagePSF(data["psfs"].astype(np.float32)),
                             weights=weights,
                             channels=channels).match(frame)
        centers = [(float(r["y"]), float(r["x"])) for r in data["catalog"]]
        sources, _ = st.initialization.init_all_sources(
            frame, centers, obs, max_components=2, min_snr=30, silent=True)
        blend = st.Blend(sources, obs)

    t0 = time.perf_counter()
    it, logL = blend.fit(100, e_rel=1e-4)
    wall = time.perf_counter() - t0
    print(f"main path: {it} iterations, logL {logL:.1f}, "
          f"{wall:.1f}s wall (incl. compile)")
    t0 = time.perf_counter()
    it2, logL2 = blend.fit(20)
    wall2 = time.perf_counter() - t0
    print(f"main path warm refit: {it2} its in {wall2:.2f}s "
          f"({wall2/max(it2,1)*1e3:.0f} ms/it), logL {logL2:.1f}")
    assert np.isfinite(logL)


def multires_path():
    import scarlet_tpu as st
    from scarlet_tpu.utils.wcs import make_tan_wcs

    rng = np.random.RandomState(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # HR 0.2"/pix 80x80, LR 0.6"/pix 30x30, same pointing
        wcs_hr = make_tan_wcs(0.2, (80, 80), crval=(150.0, 2.0))
        wcs_lr = make_tan_wcs(0.6, (30, 30), crval=(150.0, 2.0))
        yy, xx = np.mgrid[:80, :80]
        blob = np.exp(-((yy - 40) ** 2 + (xx - 40) ** 2) / 30.0)
        img_hr = (blob + rng.randn(80, 80) * 0.01).astype(np.float32)
        psf_hr = st.GaussianPSF(sigma=1.0, boxsize=15).get_model()
        psf_lr = st.GaussianPSF(sigma=1.2, boxsize=15).get_model()
        yl, xl = np.mgrid[:30, :30]
        # same blob evaluated on the 3x-coarser grid
        blob_lr = np.exp(-((3 * (yl - 15)) ** 2 + (3 * (xl - 15)) ** 2)
                         / 30.0)
        img_lr = (blob_lr + rng.randn(30, 30) * 0.01).astype(np.float32)
        obs_hr = st.Observation(img_hr[None], wcs=wcs_hr,
                                psf=st.ImagePSF(np.asarray(psf_hr)),
                                channels=["hr"])
        obs_lr = st.Observation(img_lr[None], wcs=wcs_lr,
                                psf=st.ImagePSF(np.asarray(psf_lr)),
                                channels=["lr"])
        frame = st.Frame.from_observations([obs_lr, obs_hr], obs_id=1)
        src = st.CompactExtendedSource(frame, (150.0, 2.0),
                                       [obs_hr, obs_lr])
        blend = st.Blend([src], [obs_hr, obs_lr])

    t0 = time.perf_counter()
    it, logL = blend.fit(20, e_rel=1e-6)
    wall = time.perf_counter() - t0
    print(f"multires joint fit: {it} its, logL {logL:.1f}, {wall:.1f}s "
          "(incl. compile)")
    assert np.isfinite(logL)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main_path()
    multires_path()
    print("TPU smoke: OK")
