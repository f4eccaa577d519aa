"""Optimizable renderer ``psf_shift`` and ``noise_factor`` gradient
softening — the two implemented-but-untested paths VERDICT r2 named.

Refs: scarlet/renderer.py:175-177, 250-256 (psf_shift as a fit parameter);
scarlet/observation.py:147-170 and blend.py:85-98 (noise_factor).
"""
import numpy as np
import pytest

import scarlet_tpu as st
from scarlet_tpu.models.renderer import ConvolutionRenderer


def _blob_cube(shape, blobs):
    """Smooth positive test scene: sum of analytic Gaussians per channel."""
    C, H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    cube = np.zeros(shape, np.float64)
    for (cy, cx, sig, amps) in blobs:
        g = np.exp(-0.5 * ((yy - cy) ** 2 + (xx - cx) ** 2) / sig ** 2)
        cube += np.asarray(amps)[:, None, None] * g
    return cube


class TestPsfShift:
    def test_psf_shift_recovers_subpixel_offset(self):
        """Fit ONLY the renderer's psf_shift on data rendered with a known
        sub-pixel kernel shift; the optimizer must recover it.

        Ref: scarlet/renderer.py:250-256 — the shift Fourier-translates the
        difference kernel and is exposed as an optimizable Parameter
        (renderer.py:175-177)."""
        shape = (3, 41, 41)
        channels = [0, 1, 2]
        true_shift = np.array([0.31, -0.22])

        frame = st.Frame(shape, channels=channels,
                         psf=st.GaussianPSF(sigma=0.7, boxsize=15))
        cube = _blob_cube(shape, [
            (14.0, 17.0, 1.6, (2.0, 3.0, 1.5)),
            (26.0, 24.0, 2.4, (1.0, 1.4, 2.2)),
        ])

        obs_psf = st.GaussianPSF(sigma=1.3, boxsize=15)
        obs0 = st.Observation(np.zeros(shape), channels=channels,
                              psf=obs_psf)
        r_true = ConvolutionRenderer(obs0, frame, psf_shift=true_shift)
        data = np.asarray(r_true(cube))

        obs = st.Observation(data, channels=channels, psf=obs_psf,
                             weights=np.full(shape, 1e4))
        r_fit = ConvolutionRenderer(obs, frame, psf_shift=(0.0, 0.0))
        obs.match(frame, renderer=r_fit)
        assert len(obs.parameters) == 1
        assert obs.parameters[0].name == "psf_shift"

        src = st.CubeComponent(
            frame, st.Parameter(cube, name="cube", fixed=True))
        blend = st.Blend([src], obs)
        blend.fit(120, e_rel=0.0)

        recovered = np.asarray(obs.parameters[0].value)
        assert np.allclose(recovered, true_shift, atol=0.03), (
            f"recovered {recovered} vs true {true_shift}")

    def test_psf_shift_moves_kernel(self):
        """An integer-ish psf_shift translates the rendered image by the
        same amount (sanity anchor for the shift sign convention)."""
        shape = (1, 33, 33)
        frame = st.Frame(shape, channels=[0],
                         psf=st.GaussianPSF(sigma=0.7, boxsize=15))
        cube = _blob_cube(shape, [(16.0, 16.0, 1.8, (1.0,))])
        obs0 = st.Observation(np.zeros(shape), channels=[0],
                              psf=st.GaussianPSF(sigma=1.2, boxsize=15))
        r0 = ConvolutionRenderer(obs0, frame)
        r1 = ConvolutionRenderer(obs0, frame, psf_shift=(1.0, 0.0))
        base = np.asarray(r0(cube))[0]
        shifted = np.asarray(r1(cube))[0]
        # shift=(1,0) moves the kernel (and the image) down one row
        assert np.allclose(shifted[1:, :], base[:-1, :], atol=1e-3)


class TestNoiseFactor:
    @pytest.fixture()
    def small_blend(self):
        rng = np.random.default_rng(3)
        shape = (2, 31, 31)
        frame = st.Frame(shape, channels=[0, 1],
                         psf=st.GaussianPSF(sigma=0.8, boxsize=15))
        cube = _blob_cube(shape, [(15.0, 15.0, 2.0, (3.0, 4.0))])
        # per-channel observed PSF (get_psf_spectrum indexes psf[c], like
        # the reference initialization.py:135-139)
        obs_psf = st.GaussianPSF(sigma=(1.1, 1.15), boxsize=15)
        obs0 = st.Observation(np.zeros(shape), channels=[0, 1], psf=obs_psf)
        r = ConvolutionRenderer(obs0, frame)
        clean = np.asarray(r(cube))
        sigma = 0.02
        data = clean + rng.normal(scale=sigma, size=shape)
        weights = np.full(shape, 1.0 / sigma ** 2)
        obs = st.Observation(data, channels=[0, 1], psf=obs_psf,
                             weights=weights)
        obs.match(frame)
        sources, skipped = st.initialization.init_all_sources(
            frame, [(15.0, 15.0)], obs, max_components=1, min_snr=50,
            silent=True)
        assert not skipped
        return st.Blend(sources, obs), obs

    def test_weights_scaled_and_data_perturbed(self, small_blend):
        """noise_factor > 0 divides the weights by (noise_factor + 1) and
        re-draws the data with noise_rms-scale noise
        (ref observation.py:164-168)."""
        blend, obs = small_blend
        np.random.seed(0)
        (data_, weights_), = blend._data_weights(noise_factor=1.0)
        assert np.allclose(np.asarray(weights_),
                           np.asarray(obs.weights) / 2.0)
        diff = np.asarray(data_) - np.asarray(obs.data)
        assert np.any(diff != 0)
        # injected noise has the observation's noise RMS scale
        assert 0.3 < np.std(diff) / np.mean(obs.noise_rms) < 3.0

        # zero factor: untouched
        (data0, weights0), = blend._data_weights(noise_factor=0)
        assert np.array_equal(np.asarray(data0), np.asarray(obs.data))
        assert np.array_equal(np.asarray(weights0), np.asarray(obs.weights))

    def test_observation_log_likelihood_noise_factor(self, small_blend):
        """Observation.get_log_likelihood(noise_factor>0) differs from the
        clean logL but stays finite (ref observation.py:147-170)."""
        blend, obs = small_blend
        model = blend.get_model()
        clean = float(obs.get_log_likelihood(model))
        np.random.seed(1)
        noisy = float(obs.get_log_likelihood(model, noise_factor=0.5))
        assert np.isfinite(noisy)
        assert noisy != clean

    def test_fit_with_noise_factor_converges(self, small_blend):
        """The fit still runs and improves the (clean) likelihood with
        per-iteration noise re-draws (blend.py:85-98 forwards noise_factor;
        segment forces 1)."""
        blend, obs = small_blend
        np.random.seed(2)
        it, logL = blend.fit(30, e_rel=1e-4, noise_factor=0.2)
        assert it > 1
        assert np.isfinite(logL)
        clean_logL = float(obs.get_log_likelihood(blend.get_model()))
        assert np.isfinite(clean_logL)
        # model explains the data to near the (clean) noise level
        model = np.asarray(obs.render(blend.get_model()))
        chi2_dof = float(np.mean(
            np.asarray(obs.weights)
            * (np.asarray(obs.data) - model) ** 2))
        assert chi2_dof < 3.0, f"chi2/dof = {chi2_dof}"
