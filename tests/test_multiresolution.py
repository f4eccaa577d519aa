"""Multi-resolution rendering acceptance tests (SDR > 10 dB), mirroring the
reference's tests/test_multiresolution.py.

The reference's stored test data requires astropy to unpickle (absent in
this runtime), so these tests build analytically-known synthetic
observations instead: Gaussian scenes observed by a high-resolution
instrument and a coarser (optionally rotated) one, where the exact LR image
is known in closed form.
"""
import numpy as np
import pytest

import scarlet_tpu as st
from scarlet_tpu.utils import make_tan_wcs


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
