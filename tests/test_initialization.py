"""Unit tests for the main-path initialization helpers
(scarlet/initialization.py semantics), incl. the previously-untested
``get_pixel_spectrum(models=...)`` branch (ref initialization.py:47-66)."""
import numpy as np
import pytest

import scarlet_tpu as st
from scarlet_tpu import initialization as init_mod


@pytest.fixture(scope="module")
def obs_setup():
    rng = np.random.default_rng(7)
    C, H, W = 3, 31, 29
    images = rng.uniform(0.5, 2.0, size=(C, H, W)).astype(np.float32)
    weights = np.ones_like(images)
    psf = st.GaussianPSF(sigma=[0.9, 1.1, 1.3], boxsize=15)
    model_frame = st.Frame((C, H, W), channels=list("gri"),
                           psf=st.GaussianPSF(sigma=0.7, boxsize=15))
    obs = st.Observation(images, psf=psf, weights=weights,
                         channels=list("gri")).match(model_frame)
    return model_frame, obs, images


class TestGetPixelSpectrum:
    def test_plain(self, obs_setup):
        _, obs, images = obs_setup
        spec = init_mod.get_pixel_spectrum((10, 12), obs)
        np.testing.assert_allclose(spec, images[:, 10, 12], rtol=1e-6)

    def test_correct_psf(self, obs_setup):
        """PSF-peak correction: spectrum / max(psf) per band
        (ref initialization.py:56-60)."""
        _, obs, images = obs_setup
        spec = init_mod.get_pixel_spectrum((10, 12), obs, correct_psf=True)
        peaks = np.asarray(obs.psf.get_model()).max(axis=(1, 2))
        np.testing.assert_allclose(spec, images[:, 10, 12] / peaks,
                                   rtol=1e-6)

    def test_models_branch(self, obs_setup):
        """``models=`` divides by the rendered model's pixel value
        (ref initialization.py:61-63) — the normalization used when
        re-estimating a source's SED against its own rendered morphology."""
        _, obs, images = obs_setup
        model = np.full_like(images, 0.25)
        model[:, 10, 12] = [0.5, 2.0, 4.0]
        spec = init_mod.get_pixel_spectrum((10, 12), obs, models=model)
        np.testing.assert_allclose(
            spec, images[:, 10, 12] / np.array([0.5, 2.0, 4.0]), rtol=1e-6)

    def test_models_multi_observation_concat(self, obs_setup):
        _, obs, images = obs_setup
        m1 = np.full_like(images, 2.0)
        m2 = np.full_like(images, 4.0)
        spec = init_mod.get_pixel_spectrum((5, 5), [obs, obs],
                                           models=[m1, m2])
        assert spec.shape == (2 * images.shape[0],)
        np.testing.assert_allclose(spec[:3], images[:, 5, 5] / 2.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(spec[3:], images[:, 5, 5] / 4.0,
                                   rtol=1e-6)

    def test_models_excludes_correct_psf(self, obs_setup):
        _, obs, images = obs_setup
        with pytest.raises(AssertionError):
            init_mod.get_pixel_spectrum((5, 5), obs, correct_psf=True,
                                        models=np.ones_like(images))
