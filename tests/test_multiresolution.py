"""Multi-resolution rendering acceptance tests (SDR > 10 dB), mirroring the
reference's tests/test_multiresolution.py.

Two data tiers:
  * synthetic analytically-known Gaussian scenes (fast, rotation-controlled);
  * the reference's OWN bundled data (data/test_resampling/*): the
    Multiresolution_tests.npz / Multiresolution_padded_tests.npz survey
    pairs (astropy-pickled WCS recovered by utils.fits.read_pickled_wcs)
    and the real HSC+HST FITS cutouts, reproducing the reference's SDR>10dB
    acceptance assertions (reference tests/test_multiresolution.py:49-150).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import scarlet_tpu as st
from scarlet_tpu.utils import make_tan_wcs
from scarlet_tpu.utils.fits import read_fits, read_pickled_wcs

REF_DATA = "/root/reference/data/test_resampling"
needs_ref_data = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not available")


def SDR(X_true, X):
    """Source distortion ratio (reference test_multiresolution.py:6-8)."""
    X_true = np.asarray(X_true)
    X = np.asarray(X)
    return 10 * np.log10(
        np.sum(X_true ** 2) ** 0.5 / np.sum((X_true - X) ** 2) ** 0.5)


def gaussian_image(wcs, shape, blobs, pixel_arcsec):
    """Evaluate sum of 2D Gaussians (flux, sky dx/dy arcsec, sigma arcsec)
    on a pixel grid, in flux-per-pixel units."""
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W].astype(float)
    pix = np.stack([xx.ravel(), yy.ravel()], axis=1)
    world = wcs.pixel_to_world_values(pix)  # (N, 2) ra/dec deg
    ra0, dec0 = wcs.wcs.crval
    # small-field tangent-plane offsets in arcsec
    dx = (world[:, 0] - ra0) * np.cos(np.deg2rad(dec0)) * 3600
    dy = (world[:, 1] - dec0) * 3600
    img = np.zeros(H * W)
    area = pixel_arcsec ** 2
    for flux, bx, by, sigma in blobs:
        r2 = (dx - bx) ** 2 + (dy - by) ** 2
        img += flux * area / (2 * np.pi * sigma ** 2) * \
            np.exp(-r2 / (2 * sigma ** 2))
    return img.reshape(H, W).astype(np.float32)


def embed_centered(data, model_frame):
    """Center the observed HR image in the (padded) model frame, the
    convention of the reference's multiresolution test (which passes the
    raw HR image through the centered-padding render path)."""
    from scarlet_tpu.ops import fft as fft_ops
    return np.asarray(fft_ops.zero_pad(data, model_frame.shape[-2:],
                                       axes=(-2, -1)))


def make_pair(rotation_lr=0.0, scale_hr=0.1, scale_lr=0.3,
              shape_hr=(64, 64), shape_lr=(24, 24)):
    """(obs_hr, obs_lr, data_hr, data_lr): two instruments observing the
    same Gaussian scene; both observed images known analytically."""
    crval = (150.0, 2.0)
    wcs_hr = make_tan_wcs(scale_hr, shape_hr, crval=crval)
    wcs_lr = make_tan_wcs(scale_lr, shape_lr, crval=crval,
                          rotation=rotation_lr)

    # scene blobs: (flux, dx arcsec, dy arcsec, sigma arcsec)
    blobs = [
        (100.0, 0.0, 0.0, 0.35),
        (40.0, 0.9, -0.5, 0.25),
        (25.0, -0.8, 0.7, 0.5),
    ]
    sigma_psf_hr = 0.12   # arcsec
    sigma_psf_lr = 0.45

    def observed(blobs, sigma_psf):
        return [(f, bx, by, np.hypot(s, sigma_psf)) for f, bx, by, s in blobs]

    data_hr = gaussian_image(wcs_hr, shape_hr, observed(blobs, sigma_psf_hr),
                             scale_hr)
    data_lr = gaussian_image(wcs_lr, shape_lr, observed(blobs, sigma_psf_lr),
                             scale_lr)

    # PSF images on each grid
    psf_hr = gaussian_image(
        make_tan_wcs(scale_hr, (21, 21), crval=crval),
        (21, 21), [(1.0, 0, 0, sigma_psf_hr)], scale_hr)[None]
    psf_lr = gaussian_image(
        make_tan_wcs(scale_lr, (21, 21), crval=crval, rotation=rotation_lr),
        (21, 21), [(1.0, 0, 0, sigma_psf_lr)], scale_lr)[None]

    obs_hr = st.Observation(data_hr[None], wcs=wcs_hr,
                            psf=st.ImagePSF(psf_hr), channels=["hr"])
    obs_lr = st.Observation(data_lr[None], wcs=wcs_lr,
                            psf=st.ImagePSF(psf_lr), channels=["lr"])
    return obs_hr, obs_lr, data_hr, data_lr


class TestResolutionRenderer:
    @pytest.mark.parametrize("coverage", ["union", "intersection"])
    def test_aligned(self, coverage):
        obs_hr, obs_lr, data_hr, data_lr = make_pair(rotation_lr=0.0)
        st.Frame.from_observations([obs_lr, obs_hr], obs_id=1,
                                   coverage=coverage)
        assert type(obs_lr.renderer).__name__ == "ResolutionRenderer"
        assert not obs_lr.renderer.isrot

        model = embed_centered(data_hr[None], obs_hr.model_frame)
        interp = np.asarray(obs_lr.render(model))[0]
        sdr = SDR(data_lr, interp)
        assert sdr > 10, f"aligned {coverage}: SDR = {sdr:.2f} dB"

    @pytest.mark.parametrize("coverage", ["union", "intersection"])
    def test_rotated(self, coverage):
        obs_hr, obs_lr, data_hr, data_lr = make_pair(rotation_lr=np.deg2rad(28))
        st.Frame.from_observations([obs_lr, obs_hr], obs_id=1,
                                   coverage=coverage)
        assert type(obs_lr.renderer).__name__ == "ResolutionRenderer"
        assert obs_lr.renderer.isrot

        model = embed_centered(data_hr[None], obs_hr.model_frame)
        interp = np.asarray(obs_lr.render(model))[0]
        sdr = SDR(data_lr, interp)
        assert sdr > 10, f"rotated {coverage}: SDR = {sdr:.2f} dB"

    def test_joint_fit(self):
        """Joint HR+LR fit of a single source improves the joint logL."""
        obs_hr, obs_lr, data_hr, data_lr = make_pair(rotation_lr=0.0)
        model_frame = st.Frame.from_observations([obs_lr, obs_hr], obs_id=1)
        # center of the brightest blob = crval
        center = model_frame.get_pixel((150.0, 2.0))
        src = st.CompactExtendedSource(model_frame, (150.0, 2.0),
                                       [obs_hr, obs_lr])
        blend = st.Blend([src], [obs_hr, obs_lr])
        it, logL = blend.fit(20, e_rel=1e-6)
        logLs = blend.log_likelihood
        assert logLs[-1] > logLs[0]


# ---------------------------------------------------------------------------
# The reference's own bundled data (data/test_resampling/*)
# ---------------------------------------------------------------------------

def _load_survey_npz(name):
    """(images, psfs, wcss) from a Multiresolution*_tests.npz: plain arrays
    via allow_pickle, the astropy-pickled wcs column via the stub
    unpickler."""
    path = os.path.join(REF_DATA, name)
    datas = np.load(path, allow_pickle=True)
    images = list(datas["images"])
    psfs = list(datas["psf"])
    wcss = read_pickled_wcs(path)
    return images, psfs, wcss


def _setup_pair(data_hr, wcs_hr, data_lr, wcs_lr, psf_hr, psf_lr, coverage):
    """Mirror of the reference's setup_scarlet
    (tests/test_multiresolution.py:11-47): two single-channel observations,
    model frame from the HR one (obs_id=1)."""
    obs_hr = st.Observation(np.asarray(data_hr, np.float64)[None],
                            wcs=wcs_hr,
                            psf=st.ImagePSF(np.asarray(psf_hr)),
                            channels=["hr"])
    obs_lr = st.Observation(np.asarray(data_lr, np.float64)[None],
                            wcs=wcs_lr,
                            psf=st.ImagePSF(np.asarray(psf_lr)),
                            channels=["lr"])
    st.Frame.from_observations([obs_lr, obs_hr], obs_id=1, coverage=coverage)
    return obs_lr, obs_hr


def _embed_hr(data_hr, obs_hr):
    """Place the raw HR image into the model frame at its WCS position —
    the model the reference test renders (data_hr passed as the model,
    reference tests/test_multiresolution.py:90-103)."""
    frame = obs_hr.model_frame
    model = np.zeros((1,) + frame.shape[-2:], dtype=np.float64)
    # HR pixel (0, 0) in model-frame pixels
    oy, ox = np.round(
        np.asarray(obs_hr.convert_pixel_to(frame, (0.0, 0.0)), float)
    ).astype(int)
    H, W = data_hr.shape
    # clip to the overlap (intersection frames can be smaller than the HR
    # image; only the covered region is modeled)
    sy0, sx0 = max(0, -oy), max(0, -ox)
    ty0, tx0 = max(0, oy), max(0, ox)
    h = min(H - sy0, model.shape[1] - ty0)
    w = min(W - sx0, model.shape[2] - tx0)
    assert h > 0 and w > 0, "HR image does not overlap the model frame"
    model[0, ty0:ty0 + h, tx0:tx0 + w] = data_hr[sy0:sy0 + h, sx0:sx0 + w]
    return model


@needs_ref_data
class TestLowResObservationReferenceData:
    """The reference's test_surveys / test_padded_frame on its own data."""

    @pytest.mark.parametrize("coverage", ["union", "intersection"])
    def test_surveys(self, coverage):
        images, psfs, wcss = _load_survey_npz("Multiresolution_tests.npz")
        for i in range(len(images)):
            for j in range(i + 1, len(images)):
                obs_lr, obs_hr = _setup_pair(
                    images[i], wcss[i], images[j], wcss[j],
                    psfs[i], psfs[j], coverage)
                model = _embed_hr(np.asarray(images[i], np.float64), obs_hr)
                interp = np.asarray(obs_lr.render(model))[0]
                sdr = SDR(interp, np.asarray(images[j], np.float64))
                assert sdr > 10, (
                    f"pair ({i},{j}) {coverage}: SDR = {sdr:.2f} dB")

    @pytest.mark.parametrize("coverage", ["union", "intersection"])
    def test_padded_frame(self, coverage):
        images, psfs, wcss = _load_survey_npz(
            "Multiresolution_padded_tests.npz")
        for j in range(1, len(images)):
            obs_lr, obs_hr = _setup_pair(
                images[0], wcss[0], images[j], wcss[j],
                psfs[0], psfs[j], coverage)
            model = _embed_hr(np.asarray(images[0], np.float64), obs_hr)
            interp = np.asarray(obs_lr.render(model))[0]
            sdr = SDR(interp, np.asarray(images[j], np.float64))
            assert sdr > 10, f"padded pair (0,{j}) {coverage}: SDR={sdr:.2f}"


@needs_ref_data
class TestRealHSCHST:
    """Joint HSC+HST deblending on the reference's real cutouts
    (the docs/tutorials/multiresolution.ipynb dataset): the HSC grid is
    3x coarser (aligned — the pair's rotation is ~1e-14, so this runs
    the aligned ResolutionRenderer; the rotated path is covered by the
    synthetic 28-deg pair above), with real WCS headers read without
    astropy."""

    def _load(self):
        hsc, hdr_hsc, wcs_hsc = read_fits(os.path.join(REF_DATA,
                                                       "Cut_HSC.fits"))
        hst, hdr_hst, wcs_hst = read_fits(os.path.join(REF_DATA,
                                                       "Cut_HST.fits"))
        psf_hsc, _, _ = read_fits(os.path.join(REF_DATA, "PSF_HSC.fits"))
        psf_hst, _, _ = read_fits(os.path.join(REF_DATA, "PSF_HST.fits"))
        return (hsc, wcs_hsc, psf_hsc), (hst, wcs_hst, psf_hst)

    def test_joint_frame_and_fit(self):
        (hsc, wcs_hsc, psf_hsc), (hst, wcs_hst, psf_hst) = self._load()
        channels_hsc = ["g", "r", "i", "z", "y"]

        obs_hsc = st.Observation(hsc, wcs=wcs_hsc, psf=st.ImagePSF(psf_hsc),
                                 channels=channels_hsc)
        obs_hst = st.Observation(hst[None], wcs=wcs_hst,
                                 psf=st.ImagePSF(psf_hst[None]),
                                 channels=["F814W"])
        model_frame = st.Frame.from_observations(
            [obs_hsc, obs_hst], coverage="intersection")
        # HST is the finer grid -> HSC goes through the resampling renderer
        assert type(obs_hsc.renderer).__name__ == "ResolutionRenderer"

        # the two brightest catalog objects of the cutout (sky coords from
        # the reference tutorial's catalog region)
        centers = [
            obs_hst.get_sky_coord((118.0, 134.0)),
            obs_hst.get_sky_coord((42.0, 167.0)),
        ]
        sources = [
            st.CompactExtendedSource(model_frame, c, [obs_hsc, obs_hst])
            for c in centers
        ]
        blend = st.Blend(sources, [obs_hsc, obs_hst])
        it, logL = blend.fit(15, e_rel=1e-4)
        logLs = blend.log_likelihood
        assert np.all(np.isfinite(logLs))
        assert logLs[-1] > logLs[0]


class TestPrecisionPins:
    """The resampling contractions must carry the f32-equivalent matmul
    tier: XLA DEFAULT is 1-pass bf16 on TPU, measured to cost 11 dB of
    on-chip render fidelity (BASELINE r5, tools/multires_precision_probe
    .py) — and the CPU suite computes every tier in exact f32, so only
    this jaxpr-level check can catch a dropped pin off-chip."""

    @staticmethod
    def _dot_precisions(fn, *args):
        import jax

        out = []

        def walk(jx):
            for e in jx.eqns:
                if e.primitive.name == "dot_general":
                    out.append(e.params.get("precision"))
                for v in e.params.values():
                    if hasattr(v, "jaxpr"):
                        walk(v.jaxpr)

        walk(jax.make_jaxpr(fn)(*args).jaxpr)
        return out

    @pytest.mark.parametrize("rotation", [0.0, np.deg2rad(28)])
    def test_renderer_contractions_pinned(self, rotation):
        import jax.numpy as jnp
        from jax.lax import Precision

        obs_hr, obs_lr, data_hr, data_lr = make_pair(rotation_lr=rotation)
        st.Frame.from_observations([obs_lr, obs_hr], obs_id=1,
                                   coverage="union")
        model = jnp.asarray(embed_centered(data_hr[None],
                                           obs_hr.model_frame))
        precs = self._dot_precisions(obs_lr.renderer, model)
        assert precs, "renderer lowered no dot_general?"
        assert all(p == (Precision.HIGHEST, Precision.HIGHEST)
                   for p in precs), precs

    def test_sinc_interp_pinned(self):
        import jax.numpy as jnp
        from jax.lax import Precision
        from scarlet_tpu.ops.interpolation import sinc_interp

        images = jnp.ones((1, 8, 8), jnp.float32)
        hr = (np.linspace(0, 7, 16), np.linspace(0, 7, 16))
        lr = (np.arange(8.0), np.arange(8.0))
        precs = self._dot_precisions(
            lambda im: sinc_interp(im, hr, lr, angle=None), images)
        assert precs and all(
            p == (Precision.HIGHEST, Precision.HIGHEST) for p in precs)
