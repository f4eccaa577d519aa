"""Batched multi-resolution deblending (parallel.multires): joint
HR+LR fits over a batch of blends as one compiled program must be
vmap-consistent and recover the synthetic scenes the single-blend
renderer acceptance tests use (test_multiresolution.make_pair)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import scarlet_tpu as st
from scarlet_tpu.parallel.multires import MultiResFitter, multires_init
from test_multiresolution import SDR, make_pair

REF_DATA = "/root/reference/data/test_resampling"
needs_ref_data = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not available")

RA0, DEC0 = 150.0, 2.0
BLOB_SKY = [(0.0, 0.0), (0.9, -0.5), (-0.8, 0.7)]
TRUE_FLUX = np.array([100.0, 40.0, 25.0])


def _centers(frame, B):
    pts = []
    for dx, dy in BLOB_SKY:
        ra = RA0 + dx / 3600 / np.cos(np.deg2rad(DEC0))
        dec = DEC0 + dy / 3600
        pts.append(np.asarray(frame.get_pixel((ra, dec)), float))
    return np.tile(np.asarray(pts)[None], (B, 1, 1))


def _setup(rotation_lr, scales):
    obs_hr, obs_lr, data_hr, data_lr = make_pair(rotation_lr=rotation_lr)
    frame = st.Frame.from_observations([obs_lr, obs_hr], obs_id=1)
    scales = np.asarray(scales, np.float32)
    d_hr = np.stack([data_hr[None] * s for s in scales])
    d_lr = np.stack([data_lr[None] * s for s in scales])
    w_hr = np.full_like(d_hr, 400.0)
    w_lr = np.full_like(d_lr, 400.0)
    return (obs_hr, obs_lr), frame, (d_hr, d_lr), (w_hr, w_lr), scales


class TestSyntheticAligned:
    @pytest.fixture(scope="class")
    def fit(self):
        scales = [1.0, 0.7, 1.5]
        obs, frame, datas, weights, scales = _setup(0.0, scales)
        fitter = MultiResFitter(obs, box_size=31)
        init = multires_init(obs, datas, _centers(frame, len(scales)),
                             box_size=31, n_slots=3)
        out = fitter.fit(datas, weights, *init, n_iter=200)
        return obs, fitter, datas, weights, init, out, scales

    def test_converges_and_improves(self, fit):
        _, _, _, _, _, (seds, morphs, loss, iters, losses), _ = fit
        losses = np.asarray(losses)
        assert np.all(np.isfinite(losses))
        # loss improves > 100x everywhere; the e_rel=1e-4 stop may or
        # may not fire before the cap (adaprox's slow tail — the same
        # genuinely-binding cap as the single-grid engine on real data)
        assert np.all(losses[0] / np.asarray(loss) > 100)
        assert np.all(np.asarray(iters) >= 1)

    def test_renders_match_data(self, fit):
        obs, fitter, datas, _, init, out, _ = fit
        seds, morphs = out[0], out[1]
        rh, rl = fitter.render_batch(seds, morphs, init[2], init[3])
        for b in range(datas[0].shape[0]):
            assert SDR(datas[0][b, 0], np.asarray(rh[b, 0])) > 10
            assert SDR(datas[1][b, 0], np.asarray(rl[b, 0])) > 10

    def test_flux_scales_recovered(self, fit):
        """The batch rows differ only by a global flux scale; the fitted
        total fluxes must recover it."""
        _, _, _, _, init, out, scales = fit
        seds, morphs = np.asarray(out[0]), np.asarray(out[1])
        flux = (seds.sum(-1) * morphs.sum((-2, -1))).sum(-1)  # (B,)
        ratios = flux / flux[0]
        np.testing.assert_allclose(ratios, scales / scales[0], rtol=0.05)

    def test_records(self, fit):
        """multires_records: fluxes match the model integrals, centroids
        land on the true blob positions, logL includes the norm."""
        from scarlet_tpu.parallel import multires_records

        obs, fitter, datas, weights, init, out, scales = fit
        seds, morphs, loss, iters, _ = out
        recs = multires_records(fitter, seds, morphs, init[2], init[3],
                                loss, iters, weights=weights)
        assert len(recs) == len(scales)
        frame = obs[0].model_frame
        true_cen = _centers(frame, 1)[0]
        for b, r in enumerate(recs):
            np.testing.assert_allclose(
                np.asarray(r["flux"]),
                np.asarray(seds[b]) * np.asarray(morphs[b]).sum(
                    (-2, -1))[:, None], rtol=1e-6)
            err = np.linalg.norm(np.asarray(r["centroid"]) - true_cen,
                                 axis=1)
            # intensity-weighted centroids of overlapping monotonic
            # profiles shift with the absorbed neighbor tails: tight on
            # the bright blob, loose on the faint overlapped ones
            assert err[0] < 1.5, err
            assert np.all(err < 5.0), err
            assert np.isfinite(r["logL"])
            # moments: finite for active slots, symmetric positive trace
            mom = np.asarray(r["moments"])
            act = np.asarray(init[3][b])
            assert np.all(np.isfinite(mom[act]))
            assert np.all(mom[act][:, 0] + mom[act][:, 1] > 0)
            # logL = -loss - log_norm exactly (Gaussian normalization,
            # ref observation.py:172-186; negative here since w=400>1)
            ln = fitter.log_norm(weights)[b]
            np.testing.assert_allclose(r["logL"],
                                       -float(np.asarray(loss)[b]) - ln,
                                       rtol=1e-6)

    def test_batch_equals_single(self, fit):
        """Row b of the batched fit == a B=1 fit of blend b (vmap
        consistency of the whole compiled program)."""
        obs, fitter, datas, weights, init, out, _ = fit
        b = 1
        single = fitter.fit(
            tuple(d[b:b + 1] for d in datas),
            tuple(w[b:b + 1] for w in weights),
            init[0][b:b + 1], init[1][b:b + 1], init[2][b:b + 1],
            init[3][b:b + 1], n_iter=200)
        np.testing.assert_allclose(np.asarray(single[0][0]),
                                   np.asarray(out[0][b]), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(single[2][0]),
                                   np.asarray(out[2][b]), rtol=1e-5)
        assert int(single[3][0]) == int(out[3][b])


class TestOneCall:
    def test_deblend_multires_detects_and_fits(self):
        """deblend_multires(centers=None): device detection on the HR
        stack finds the true blobs; the one-call records match the
        manual detect->init->fit->records pipeline."""
        from scarlet_tpu.parallel import (MultiResFitter, deblend_multires,
                                          multires_init, multires_records)

        obs, frame, datas, weights, scales = _setup(0.0, [1.0, 0.7])
        out = deblend_multires(obs, datas, weights, centers=None,
                               box_size=31, n_slots=4, n_iter=60)
        records, seds, morphs, origins, active, losses = out
        active = np.asarray(active)
        # the 3 blobs, detected per blend
        assert np.all(active.sum(1) == 3)
        true_cen = _centers(frame, 1)[0]
        for b, r in enumerate(records):
            cen = np.asarray(r["centroid"])[active[b]]
            d = np.linalg.norm(cen[:, None] - true_cen[None], axis=-1)
            assert np.all(d.min(1) < 5.0)
            assert np.isfinite(r["logL"])

        # manual pipeline with the same detected centers == one-call
        centers = np.where(active[..., None],
                           np.asarray(origins, float) + 31 // 2, np.nan)
        fitter = MultiResFitter(obs, box_size=31)
        init = multires_init(obs, datas, centers, box_size=31, n_slots=4)
        s2, m2, loss2, it2, _ = fitter.fit(datas, weights, *init,
                                           n_iter=60)
        rec2 = multires_records(fitter, s2, m2, init[2], init[3], loss2,
                                it2, weights=weights)
        for a, b in zip(records, rec2):
            np.testing.assert_allclose(a["logL"], b["logL"], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(a["flux"]),
                                       np.asarray(b["flux"]), rtol=1e-5,
                                       atol=1e-6)


class TestSyntheticRotated:
    def test_rotated_pair_fit(self):
        """The rotated ResolutionRenderer path (LR grid at 28 deg) under
        the batched fitter."""
        obs, frame, datas, weights, scales = _setup(np.deg2rad(28),
                                                    [1.0, 1.3])
        assert obs[1].renderer.isrot
        fitter = MultiResFitter(obs, box_size=31)
        init = multires_init(obs, datas, _centers(frame, 2),
                             box_size=31, n_slots=3)
        seds, morphs, loss, iters, losses = fitter.fit(
            datas, weights, *init, n_iter=120)
        losses = np.asarray(losses)
        assert np.all(np.isfinite(losses))
        assert np.all(losses[0] / np.asarray(loss) > 50)
        rh, rl = fitter.render_batch(seds, morphs, init[2], init[3])
        for b in range(2):
            assert SDR(datas[0][b, 0], np.asarray(rh[b, 0])) > 10
            assert SDR(datas[1][b, 0], np.asarray(rl[b, 0])) > 8


@needs_ref_data
class TestRealHSCHST:
    def test_batched_beats_object_tree_at_equal_iterations(self):
        """The batched fitter with box growth + incumbent tracking
        reaches a BETTER logL than the object-tree `Blend.fit` on the
        multiresolution tutorial config at the same iteration count
        (kills the r3 finding that the batched 2-source fit was ~3%
        worse because only the object tree grows its boxes)."""
        from scarlet_tpu.utils.fits import read_fits

        hsc, _, wcs_hsc = read_fits(os.path.join(REF_DATA, "Cut_HSC.fits"))
        hst, _, wcs_hst = read_fits(os.path.join(REF_DATA, "Cut_HST.fits"))
        psf_hsc, _, _ = read_fits(os.path.join(REF_DATA, "PSF_HSC.fits"))
        psf_hst, _, _ = read_fits(os.path.join(REF_DATA, "PSF_HST.fits"))
        obs_hsc = st.Observation(hsc, wcs=wcs_hsc, psf=st.ImagePSF(psf_hsc),
                                 channels=list("grizy"))
        obs_hst = st.Observation(hst[None], wcs=wcs_hst,
                                 psf=st.ImagePSF(psf_hst[None]),
                                 channels=["F814W"])
        frame = st.Frame.from_observations([obs_hsc, obs_hst],
                                           coverage="intersection")
        sky = [obs_hst.get_sky_coord((118.0, 134.0)),
               obs_hst.get_sky_coord((42.0, 167.0))]

        # object tree: grows boxes via UpdateException warm restarts
        srcs = [st.CompactExtendedSource(frame, s, [obs_hsc, obs_hst])
                for s in sky]
        blend = st.Blend(srcs, [obs_hsc, obs_hst])
        n_iter, logL_tree = blend.fit(200, e_rel=1e-6)
        assert max(s.bbox.shape[-1] for s in blend.sources) > 61

        # batched fitter at the SAME iteration budget: physical box at
        # the tree's grown size, logical boxes grow in-program from the
        # PSF seed, morph step 5e-2 (measured: 1e-2 underfits this
        # config in <=200 iterations), incumbent tracking guards the
        # late-phase adaprox drift
        centers = np.asarray([
            np.asarray(frame.get_pixel(s), float)[:2] for s in sky])[None]
        d_hst = np.asarray(hst, np.float32)[None][None]
        d_hsc = np.asarray(hsc, np.float32)[None]
        w_hst = np.full_like(d_hst, 1.0)
        w_hsc = np.full_like(d_hsc, 1.0)
        obs = (obs_hst, obs_hsc)
        fitter = MultiResFitter(obs, box_size=151, e_rel=1e-8,
                                morph_step=5e-2, box_grow=0.1)
        init = multires_init(obs, (d_hst, d_hsc), centers,
                             box_size=151, n_slots=2)
        seds, morphs, loss, iters, losses = fitter.fit(
            (d_hst, d_hsc), (w_hst, w_hsc), *init, n_iter=n_iter)
        logL = float(-np.asarray(loss)[0]
                     - fitter.log_norm((w_hst, w_hsc))[0])
        # boxes grew from the PSF seed
        assert fitter.last_box_half_[0].max() > 10
        assert logL >= float(logL_tree), (logL, float(logL_tree))

    def test_joint_batch_fit(self):
        """Joint HSC(5-band, resampled+rotated) + HST(1-band) batched fit
        on the reference's real cutouts (the multiresolution tutorial
        dataset)."""
        from scarlet_tpu.utils.fits import read_fits

        hsc, _, wcs_hsc = read_fits(os.path.join(REF_DATA, "Cut_HSC.fits"))
        hst, _, wcs_hst = read_fits(os.path.join(REF_DATA, "Cut_HST.fits"))
        psf_hsc, _, _ = read_fits(os.path.join(REF_DATA, "PSF_HSC.fits"))
        psf_hst, _, _ = read_fits(os.path.join(REF_DATA, "PSF_HST.fits"))

        obs_hsc = st.Observation(hsc, wcs=wcs_hsc,
                                 psf=st.ImagePSF(psf_hsc),
                                 channels=["g", "r", "i", "z", "y"])
        obs_hst = st.Observation(hst[None], wcs=wcs_hst,
                                 psf=st.ImagePSF(psf_hst[None]),
                                 channels=["F814W"])
        frame = st.Frame.from_observations([obs_hsc, obs_hst],
                                           coverage="intersection")
        assert type(obs_hsc.renderer).__name__ == "ResolutionRenderer"

        # the two brightest objects (HST pixel coords from the tutorial)
        centers_model = np.asarray([
            np.asarray(frame.get_pixel(obs_hst.get_sky_coord((118.0,
                                                              134.0))),
                       float),
            np.asarray(frame.get_pixel(obs_hst.get_sky_coord((42.0,
                                                              167.0))),
                       float),
        ])[None]

        B = 2
        d_hsc = np.stack([np.asarray(hsc, np.float32)] * B)
        d_hst = np.stack([np.asarray(hst, np.float32)[None]] * B)
        d_hsc[1] *= 1.2
        d_hst[1] *= 1.2
        w_hsc = np.full_like(d_hsc, 1.0)
        w_hst = np.full_like(d_hst, 1.0)
        centers = np.tile(centers_model, (B, 1, 1))

        obs = (obs_hst, obs_hsc)   # HST is same-grid, HSC resampled
        fitter = MultiResFitter(obs, box_size=61)
        init = multires_init(obs, (d_hst, d_hsc), centers,
                             box_size=61, n_slots=2)
        seds, morphs, loss, iters, losses = fitter.fit(
            (d_hst, d_hsc), (w_hst, w_hsc), *init, n_iter=25)
        losses = np.asarray(losses)
        assert np.all(np.isfinite(losses))
        assert np.all(losses[-1] < losses[0])
        assert np.all(np.asarray(seds) >= 0)
        flux = (np.asarray(seds).sum(-1)
                * np.asarray(morphs).sum((-2, -1)))
        assert np.all(flux[:, :1] > 0)
