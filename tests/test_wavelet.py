"""Starlet transform tests, mirroring the reference's tests/test_wavelet.py."""
import numpy as np
from numpy.testing import assert_almost_equal, assert_equal

import scarlet_tpu as st
from scarlet_tpu.ops import wavelet


class TestWavelet:
    def get_psf(self, sigma, boxsize):
        return np.asarray(st.GaussianPSF(sigma, boxsize=boxsize).get_model())[0]

    def test_transform_inverse(self):
        psf = self.get_psf(1, 128)
        starlet = st.Starlet.from_image(psf, scales=3)
        assert_equal(starlet.coefficients.shape[0], 4)
        assert_almost_equal(np.asarray(starlet.image), psf)

        # reconstruction from coefficients round-trips
        recon = wavelet.starlet_reconstruction(starlet.coefficients)
        assert_almost_equal(np.asarray(recon), psf)

    def test_gen1_roundtrip(self):
        rng = np.random.RandomState(3)
        img = rng.rand(32, 32)
        coeffs = wavelet.starlet_transform(img, scales=3, generation=1)
        recon = wavelet.starlet_reconstruction(coeffs, generation=1)
        assert_almost_equal(np.asarray(recon), img)

    def test_setter(self):
        psf = self.get_psf(1, 128)
        starlet = st.Starlet.from_image(psf, scales=3)
        star_coeff = np.asarray(starlet.coefficients).copy()
        star_coeff[:, 10:20, :] = 0

        new_starlet = st.Starlet.from_coefficients(star_coeff)
        assert new_starlet.coefficients.shape == starlet.coefficients.shape
        # zeroing rows changes the image only in/near those rows
        diff = np.abs(np.asarray(new_starlet.image) - psf)
        assert diff[40:, :].max() < 1e-6

    def test_multiband(self):
        rng = np.random.RandomState(5)
        cube = rng.rand(3, 32, 32)
        coeffs = wavelet.multiband_starlet_transform(cube, scales=3)
        assert coeffs.shape == (4, 3, 32, 32)
        recon = wavelet.multiband_starlet_reconstruction(coeffs)
        assert_almost_equal(np.asarray(recon), cube)

    def test_norm(self):
        psf = self.get_psf(1, 64)
        starlet = st.Starlet.from_image(psf, scales=3)
        norm = np.asarray(starlet.norm)
        assert norm.shape == (4,)
        assert np.all(norm > 0)
