"""FFT centering-convention and PSF-matching tests, mirroring the
reference's tests/test_fft.py (the parity anchors for the convolution
engine)."""
import numpy as np
from numpy.testing import assert_array_equal, assert_almost_equal

import scarlet_tpu as st
from scarlet_tpu.ops import fft


class TestCentering:
    def test_shift(self):
        a0 = np.ones((1, 1))
        a_pad = np.asarray(fft.zero_pad(a0, (5, 4)))
        truth = [
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
        ]
        assert_array_equal(a_pad, truth)

        a_shift = np.fft.ifftshift(a_pad)
        truth = [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
        ]
        assert_array_equal(a_shift, truth)
        assert_array_equal(np.fft.fftshift(a_shift), a_pad)

    def test_center(self):
        shape = (5, 2)
        a0 = np.arange(10).reshape(shape)
        a_pad = np.asarray(fft.zero_pad(a0, (9, 11)))
        truth = [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 2, 3, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 4, 5, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 6, 7, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 8, 9, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ]
        assert_array_equal(a_pad, truth)

        a_final = np.asarray(fft.centered(a_pad, shape))
        assert_array_equal(a_final, a0)


class TestFourier:
    def get_psfs(self, sigmas):
        boxsize = 41
        psf = st.GaussianPSF(sigmas, boxsize=boxsize)
        return psf.get_model()

    def test_2D_psf_matching(self):
        psf1 = fft.Fourier(self.get_psfs(1))
        psf2 = fft.Fourier(self.get_psfs(2))

        kernel_1to2 = fft.match_psf(psf2, psf1)
        img2 = fft.convolve(psf1, kernel_1to2)
        assert_almost_equal(np.asarray(img2.image), np.asarray(psf2.image))

        kernel_2to1 = fft.match_psf(psf1, psf2)
        img1 = fft.convolve(psf2, kernel_2to1)
        assert_almost_equal(np.asarray(img1.image), np.asarray(psf1.image))

    def test_multiband_psf_matching(self):
        psf1 = fft.Fourier(self.get_psfs(1))
        psf2 = fft.Fourier(self.get_psfs((1, 2, 3)))

        kernel_1to2 = fft.match_psf(psf2, psf1)
        image = fft.convolve(kernel_1to2, psf1)
        assert_almost_equal(np.asarray(psf2.image), np.asarray(image.image))

        kernel_2to1 = fft.match_psf(psf1, psf2)
        image = np.asarray(fft.convolve(kernel_2to1, psf2).image)
        for img in image:
            assert_almost_equal(img, np.asarray(psf1.image[0]))

    def test_convolve_fft_hot_path(self):
        """Precomputed-kernel convolution must agree with the Fourier-object
        path (the jit-compiled formulation used inside the fit loop)."""
        rng = np.random.RandomState(0)
        image = rng.rand(3, 20, 22)
        kernel = np.asarray(self.get_psfs((1.0, 1.5, 2.0)))

        ref = np.asarray(fft.convolve(image, kernel, return_fourier=False))

        fft_shape = fft.good_fft_shape(image, kernel, padding=3, axes=(-2, -1))
        k_rfft = fft.transform(np.asarray(kernel), fft_shape, (-2, -1))
        hot = np.asarray(
            fft.convolve_fft(np.asarray(image), k_rfft, fft_shape, (-2, -1))
        )
        assert_almost_equal(hot, ref)

    def test_shift(self):
        """Integer Fourier shifts of a centered compact signal match rolls;
        half-pixel shifts are symmetric."""
        psf = np.asarray(self.get_psfs(1))[0]  # 41x41, compact support
        shifted = np.asarray(fft.shift(psf, (3, -2), return_fourier=False))
        assert_almost_equal(shifted, np.roll(psf, (3, -2), axis=(0, 1)),
                            decimal=8)

        # fractional shift there and back on a smooth compact signal
        # (limited by the real-transform Nyquist bin, as in the reference)
        there = fft.shift(psf, (0.3, -0.2), return_fourier=False)
        back = np.asarray(fft.shift(there, (-0.3, 0.2), return_fourier=False))
        assert_almost_equal(back, psf, decimal=4)


class TestMinimalSameFFTShape:
    """The hot-path 'same'-crop FFT shape: circular aliasing must stay
    entirely in the discarded margin (exactness vs the full linear-
    convolution shape), across all size parities."""

    def test_exact_across_parities(self):
        rng = np.random.default_rng(3)
        for S in ((58, 48), (57, 47), (30, 31), (21, 20)):
            for Q in ((43, 43), (41, 43), (15, 15), (14, 15), (14, 16)):
                img = rng.standard_normal(S)
                ker = rng.standard_normal(Q)
                full = fft.minimal_even_fft_shape(S, Q, axes=(0, 1))
                kf = fft.transform(np.asarray(ker), full, (0, 1))
                ref = np.asarray(
                    fft.convolve_fft(np.asarray(img), kf, full, (0, 1)))
                same = fft.minimal_same_fft_shape(S, Q, axes=(0, 1))
                ks = fft.transform(np.asarray(ker), same, (0, 1))
                out = np.asarray(
                    fft.convolve_fft(np.asarray(img), ks, same, (0, 1)))
                assert all(m <= f for m, f in zip(same, full)), (S, Q)
                np.testing.assert_allclose(out, ref, atol=1e-9,
                                           err_msg=f"S={S} Q={Q} M={same}")

    def test_hsc_case_shrinks(self):
        # the engine's HSC case: (100, 90) full -> (80, 72) same-crop
        assert fft.minimal_same_fft_shape((5, 58, 48), (5, 43, 43),
                                          axes=(1, 2)) == (80, 72)


class TestDftConv:
    def test_matches_fft_path(self):
        """convolve_dft (folded matmul-DFT) == convolve_fft across odd/even
        image, kernel, and fft-shape combinations (f64 exactness)."""
        rng = np.random.default_rng(7)
        for S in ((58, 48), (57, 47), (30, 31), (21, 20)):
            for F in (fft.minimal_same_fft_shape(S, (15, 15), axes=(0, 1)),
                      fft.good_fft_shape(S, (15, 15), axes=(0, 1))):
                img = rng.standard_normal(S)
                ker = rng.standard_normal((15, 15))
                kf = fft.transform(np.asarray(ker), F, (0, 1))
                ref = np.asarray(fft.convolve_fft(np.asarray(img), kf, F,
                                                  (0, 1)))
                mats = fft.dft_conv_matrices(S, F, np.float64)
                out = np.asarray(fft.convolve_dft(np.asarray(img), kf, mats))
                np.testing.assert_allclose(out, ref, atol=1e-10,
                                           err_msg=f"S={S} F={F}")

    def test_batched_and_f32(self):
        rng = np.random.default_rng(8)
        S, F = (58, 48), (80, 72)
        img = rng.standard_normal((3, 5) + S).astype(np.float32)
        ker = rng.standard_normal((5, 15, 15)).astype(np.float32)
        kf = fft.transform(np.asarray(ker), F, (-2, -1))
        ref = np.asarray(fft.convolve_fft(np.asarray(img), kf, F, (-2, -1)))
        mats = fft.dft_conv_matrices(S, F, np.float32)
        out = np.asarray(fft.convolve_dft(np.asarray(img), kf, mats))
        np.testing.assert_allclose(out, ref, atol=2e-5 * np.abs(ref).max())
