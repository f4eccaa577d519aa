"""Direct unit tests for public helpers previously covered only
indirectly: elementary proxes, the adaprox phi/psi schemes, FISTA/adaprox
steps, lite utils, initialization trims, wavelet helpers, and measure.

Each section anchors against an independent numpy oracle (published
formulas or direct integration/convolution), not the implementation.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

import scarlet_tpu as st
from scarlet_tpu import measure, optim
from scarlet_tpu.initialization import (
    get_minimal_boxsize,
    trim_morphology,
)
from scarlet_tpu.lite.utils import (
    get_circle_mask,
    insert_image,
    integrated_circular_gaussian,
    integrated_gaussian,
    project_morph_to_center,
)
from scarlet_tpu.bbox import Box
from scarlet_tpu.ops import prox as prox_ops
from scarlet_tpu.ops import wavelet


# ---------------------------------------------------------------------------
# Elementary proxes (ref proxmin.operators semantics, scarlet constraint.py)
# ---------------------------------------------------------------------------
class TestElementaryProxes:
    X = np.array([[-2.0, -0.5, 0.0], [0.3, 0.7, 2.0]])

    def test_prox_plus(self):
        assert_array_equal(
            np.asarray(prox_ops.prox_plus(self.X)), np.maximum(self.X, 0)
        )

    def test_prox_hard_absolute(self):
        out = np.asarray(prox_ops.prox_hard(self.X, step=1.0, thresh=0.6))
        expected = np.where(np.abs(self.X) < 0.6, 0.0, self.X)
        assert_array_equal(out, expected)

    def test_prox_hard_relative(self):
        # relative: threshold scales with the step
        out = np.asarray(
            prox_ops.prox_hard(self.X, step=2.0, thresh=0.3, type="relative")
        )
        expected = np.where(np.abs(self.X) < 0.6, 0.0, self.X)
        assert_array_equal(out, expected)

    def test_prox_hard_plus(self):
        out = np.asarray(prox_ops.prox_hard_plus(self.X, step=1.0, thresh=0.6))
        expected = np.maximum(np.where(np.abs(self.X) < 0.6, 0.0, self.X), 0)
        assert_array_equal(out, expected)

    def test_prox_soft_plus(self):
        out = np.asarray(prox_ops.prox_soft_plus(self.X, step=1.0, thresh=0.4))
        soft = np.sign(self.X) * np.maximum(np.abs(self.X) - 0.4, 0)
        assert_allclose(out, np.maximum(soft, 0), rtol=1e-12)

    def test_prox_unity(self):
        out = np.asarray(prox_ops.prox_unity(self.X + 3, axis=1))
        assert_allclose(out.sum(axis=1), 1.0, rtol=1e-12)
        # global normalization when axis is None
        out = np.asarray(prox_ops.prox_unity(self.X + 3))
        assert_allclose(out.sum(), 1.0, rtol=1e-12)

    def test_prox_unity_plus(self):
        X = np.array([[-1.0, 0.5, 1.0], [0.3, 0.7, 2.0]])
        out = np.asarray(prox_ops.prox_unity_plus(X, axis=1))
        clipped = np.maximum(X, 0)
        assert_allclose(
            out, clipped / clipped.sum(axis=1, keepdims=True), rtol=1e-12
        )

    def test_prox_threshold_matches_host_threshold(self):
        """The jit-friendly prox_threshold reproduces threshold() +
        hard-plus on a realistic morphology (ref constraint.py:165-196)."""
        rng = np.random.RandomState(7)
        yy, xx = np.mgrid[:41, :41]
        morph = np.exp(-((yy - 20) ** 2 + (xx - 20) ** 2) / 40.0)
        morph += rng.rand(41, 41) * 1e-3
        thresh, _bins = prox_ops.threshold(morph)
        expected = morph * ((morph > thresh) & (morph > 0))
        out = np.asarray(prox_ops.prox_threshold(morph))
        assert_allclose(out, expected, atol=1e-12)


# ---------------------------------------------------------------------------
# Adaprox phi/psi schemes vs published-formula numpy oracles
# ---------------------------------------------------------------------------
def _oracle_phi_psi(scheme, grads, b1=0.9, b2=0.999, eps=1e-8, p=0.25):
    """Iterate the published formulas (Kingma&Ba adam; Dozat nadam; Reddi
    et al. amsgrad; Chen&Gu padam; Phuong&Phong adamx; Liu et al. radam)
    in plain numpy, returning the (phi, psi) sequence."""
    m = np.zeros_like(grads[0])
    v = np.zeros_like(grads[0])
    vhat = np.zeros_like(grads[0])
    out = []
    for t_i, g in enumerate(grads):
        t = t_i + 1.0
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        bias1 = 1 - b1 ** t
        bias2 = 1 - b2 ** t
        if scheme == "adam":
            phi, psi = m / bias1, np.sqrt(v / bias2) + eps
        elif scheme == "nadam":
            phi = (b1 * m + (1 - b1) * g) / bias1
            psi = np.sqrt(v / bias2) + eps
        elif scheme == "amsgrad":
            vhat = np.maximum(vhat, v)
            phi, psi = m, np.sqrt(vhat) + eps
        elif scheme == "padam":
            vhat = np.maximum(vhat, v)
            phi, psi = m, vhat ** p + eps
        elif scheme == "adamx":
            if t_i == 0:
                factor = 1.0
            else:
                factor = (1 - b1 ** t) ** 2 / (1 - b1 ** (t - 1)) ** 2
            vhat = np.maximum(factor * vhat, v)
            phi, psi = m, np.sqrt(vhat) + eps
        elif scheme == "radam":
            rho_inf = 2.0 / (1 - b2) - 1
            rho = rho_inf - 2 * t * b2 ** t / bias2
            mhat = m / bias1
            if rho > 4:
                r = np.sqrt(
                    ((rho - 4) * (rho - 2) * rho_inf)
                    / ((rho_inf - 4) * (rho_inf - 2) * rho)
                )
                phi, psi = r * mhat, np.sqrt(v / bias2) + eps
            else:
                phi, psi = mhat, np.ones_like(v)
        out.append((phi.copy(), psi.copy()))
    return out


class TestPhiPsiSchemes:
    @pytest.mark.parametrize("scheme", sorted(optim.SCHEMES))
    def test_matches_published_formulas(self, scheme):
        rng = np.random.RandomState(11)
        grads = [rng.randn(4, 3) for _ in range(25)]
        expected = _oracle_phi_psi(scheme, grads)

        state = optim.init_adaprox_state(np.zeros((4, 3)))
        for it, (g, (phi_e, psi_e)) in enumerate(zip(grads, expected)):
            phi, psi, state = optim.phi_psi(scheme, float(it), g, state)
            assert_allclose(np.asarray(phi), phi_e, rtol=1e-10, atol=1e-12)
            assert_allclose(np.asarray(psi), psi_e, rtol=1e-10, atol=1e-12)

    def test_amsgrad_psi_monotone(self):
        rng = np.random.RandomState(0)
        state = optim.init_adaprox_state(np.zeros(6))
        last = np.zeros(6)
        for it in range(30):
            _, psi, state = optim.phi_psi(
                "amsgrad", float(it), rng.randn(6), state
            )
            assert np.all(np.asarray(psi) >= last - 1e-15)
            last = np.asarray(psi)

    def test_radam_early_iterations_non_adaptive(self):
        # rho_t <= 4 for the first few steps at b2=0.999 -> psi == 1
        state = optim.init_adaprox_state(np.zeros(3))
        g = np.array([1.0, -2.0, 3.0])
        for it in range(3):
            _, psi, state = optim.phi_psi("radam", float(it), g, state)
            assert_allclose(np.asarray(psi), 1.0, rtol=0, atol=0)

    def test_constant_gradient_direction(self):
        # with a constant gradient, adam's phi/psi -> sign(g)
        g = np.array([0.5, -1.5])
        state = optim.init_adaprox_state(np.zeros(2))
        for it in range(300):
            phi, psi, state = optim.phi_psi("adam", float(it), g, state)
        assert_allclose(np.asarray(phi / psi), np.sign(g), atol=1e-3)


class TestOptimizerSteps:
    def test_adaprox_converges_constrained_quadratic(self):
        """min 0.5||x-a||^2 s.t. x>=0 -> x* = max(a, 0)."""
        a = np.array([1.5, -2.0, 0.3, -0.1])
        x = np.zeros(4)
        state = optim.init_adaprox_state(x)
        for it in range(400):
            g = x - a
            x, state = optim.adaprox_step(
                x, g, float(it), state, step=0.1,
                prox=prox_ops.prox_plus, scheme="amsgrad",
            )
            x = np.asarray(x)
        assert_allclose(x, np.maximum(a, 0), atol=1e-2)

    def test_adaprox_first_iteration_damped(self):
        """it==0 takes a 10x-damped step (ref lite/parameters.py:289-291)."""
        x = np.array([1.0])
        g = np.array([1.0])
        state = optim.init_adaprox_state(x)
        x1, _ = optim.adaprox_step(x, g, 0.0, state, step=0.1)
        phi, psi, _ = optim.phi_psi("amsgrad", 0.0, g, optim.init_adaprox_state(x))
        assert_allclose(
            np.asarray(x1), x - 0.1 * 0.1 * np.asarray(phi / psi), rtol=1e-12
        )

    def test_adaprox_active_mask_freezes(self):
        x = np.array([1.0, 2.0])
        state = optim.init_adaprox_state(x)
        x1, s1 = optim.adaprox_step(
            x, np.array([1.0, 1.0]), 5.0, state, step=0.1,
            active=np.asarray(False),
        )
        assert_array_equal(np.asarray(x1), x)
        assert_array_equal(np.asarray(s1.m), np.asarray(state.m))

    def test_fista_recurrence(self):
        """t_{k+1} = (1+sqrt(1+4 t_k^2))/2 and the z extrapolation match
        Beck & Teboulle 2009 (ref lite/parameters.py:91-156)."""
        x = np.array([2.0])
        state = optim.init_fista_state(x)
        g = np.array([0.5])
        x1, s1 = optim.fista_step(x, g, 0.0, state, step=0.2)
        t1 = 0.5 * (1 + np.sqrt(5.0))
        assert_allclose(float(s1.t), t1, rtol=1e-12)
        x1_expected = x - 0.2 * g  # z0 == x
        assert_allclose(np.asarray(x1), x1_expected, rtol=1e-12)
        omega = 1 + (1.0 - 1) / t1
        assert_allclose(
            np.asarray(s1.z), x + omega * (x1_expected - x), rtol=1e-12
        )

    def test_fista_converges_constrained_quadratic(self):
        a = np.array([1.5, -2.0, 0.3])
        x = np.zeros(3)
        state = optim.init_fista_state(x)
        for it in range(200):
            g = np.asarray(state.z) - a
            x, state = optim.fista_step(
                x, g, float(it), state, step=0.5, prox=prox_ops.prox_plus
            )
            x = np.asarray(x)
        assert_allclose(x, np.maximum(a, 0), atol=1e-6)


# ---------------------------------------------------------------------------
# Lite utils (ref scarlet/lite/utils.py)
# ---------------------------------------------------------------------------
class TestLiteUtils:
    def test_integrated_gaussian_matches_quadrature(self):
        from scipy.integrate import quad

        sigma = 0.8
        X = np.arange(-3, 4).astype(float)
        out = integrated_gaussian(X, sigma)
        for x, o in zip(X, out):
            val, _ = quad(
                lambda t: np.exp(-(t ** 2) / (2 * sigma ** 2)), x - 0.5, x + 0.5
            )
            assert_allclose(o, val, rtol=1e-10)

    def test_integrated_circular_gaussian_default(self):
        psf = integrated_circular_gaussian()
        assert psf.shape == (15, 15)
        assert_allclose(psf.sum(), 1.0, rtol=1e-12)
        assert np.argmax(psf) == np.ravel_multi_index((7, 7), psf.shape)
        assert_allclose(psf, psf[::-1, ::-1], atol=1e-15)  # symmetric
        with pytest.raises(ValueError):
            integrated_circular_gaussian(Y=np.arange(3))

    def test_get_circle_mask_odd(self):
        mask = get_circle_mask(5)
        assert mask.shape == (5, 5)
        assert mask[2, 2] == 1 and mask[0, 0] == 0
        assert_array_equal(mask, mask[::-1, ::-1])
        assert_array_equal(mask, mask.T)
        # radius (d-1)/2: the mid-edge pixel is exactly on the circle
        assert mask[0, 2] == 1

    def test_get_circle_mask_even(self):
        mask = get_circle_mask(4)
        assert mask.shape == (4, 4)
        assert_array_equal(mask, mask[::-1, ::-1])
        assert mask[0, 0] == 0

    def test_insert_image(self):
        big = Box((6, 6), origin=(0, 0))
        sub = Box((2, 2), origin=(2, 3))
        img = insert_image(big, sub, np.ones((2, 2)), fill=-1.0)
        assert img.shape == (6, 6)
        assert img[2, 3] == 1 and img[3, 4] == 1
        assert img[0, 0] == -1.0
        assert (img == 1).sum() == 4

    def test_insert_image_partial_overlap(self):
        big = Box((4, 4), origin=(0, 0))
        sub = Box((3, 3), origin=(-1, 2))
        src = np.arange(9.0).reshape(3, 3)
        img = insert_image(big, sub, src)
        # only rows 0-1 x cols 2-3 of the big image overlap
        assert_array_equal(img[:2, 2:], src[1:, :2])
        assert img[2:].sum() == 0 and img[:, :2].sum() == 0

    def test_project_morph_to_center(self):
        """A morphology off-center in its box lands centered in the
        output, which is odd-sized and centered on ``center``."""
        full = Box((11, 11), origin=(0, 0))
        morph = np.zeros((11, 11))
        morph[4, 6] = 1.0  # the source peak
        centered, cbox = project_morph_to_center(morph, (4, 6), full, full)
        h, w = centered.shape
        assert h % 2 == 1 and w % 2 == 1
        assert centered[h // 2, w // 2] == 1.0
        assert cbox.contains((4, 6))


# ---------------------------------------------------------------------------
# Initialization helpers (ref scarlet/initialization.py:173-210)
# ---------------------------------------------------------------------------
class TestInitHelpers:
    def test_get_minimal_boxsize_buckets(self):
        assert get_minimal_boxsize(0) == 21
        assert get_minimal_boxsize(21) == 21
        assert get_minimal_boxsize(22) == 31
        assert get_minimal_boxsize(31) == 31
        assert get_minimal_boxsize(45) == 51

    def test_trim_morphology_centered_odd_box(self):
        morph = np.zeros((41, 41))
        morph[18:23, 19:24] = 1.0  # support around (20, 21)
        morph[0, 0] = 1e-4  # sub-threshold speck
        trimmed, box = trim_morphology((20, 21), morph, bg_thresh=1e-3)
        assert box.shape[0] % 2 == 1 and box.shape[1] % 2 == 1
        # centered on the peak index
        cy = box.origin[0] + box.shape[0] // 2
        cx = box.origin[1] + box.shape[1] // 2
        assert (cy, cx) == (20, 21)
        assert trimmed.sum() == 25  # speck zeroed, support kept

    def test_trim_morphology_center_outside_support(self):
        morph = np.zeros((41, 41))
        morph[2:4, 2:4] = 1.0
        _, box = trim_morphology((30, 30), morph, bg_thresh=0)
        assert box.shape == (21, 21)  # size 0 -> minimal box


# ---------------------------------------------------------------------------
# Wavelet helpers (ref scarlet/wavelet.py)
# ---------------------------------------------------------------------------
class TestWaveletHelpers:
    def test_bspline_convolve_matches_atrous_kernel(self):
        """The shift-add formulation equals explicit a-trous correlation
        with the B3 spline filter (zero boundary)."""
        from scipy.ndimage import correlate1d

        rng = np.random.RandomState(5)
        img = rng.rand(33, 31)
        for scale in (0, 1, 2):
            s = 2 ** scale
            w = np.zeros(4 * s + 1)
            w[[0, s, 2 * s, 3 * s, 4 * s]] = [
                1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16,
            ]
            expected = correlate1d(img, w, axis=0, mode="constant", cval=0)
            expected = correlate1d(expected, w, axis=1, mode="constant",
                                   cval=0)
            out = np.asarray(wavelet.bspline_convolve(img, scale))
            assert_allclose(out, expected, rtol=1e-10, atol=1e-12)

    def test_get_scales(self):
        assert wavelet.get_scales((32, 32)) == 4
        assert wavelet.get_scales((32, 64)) == 4  # min dimension rules
        assert wavelet.get_scales((32, 32), scales=2) == 2
        assert wavelet.get_scales((32, 32), scales=10) == 4  # capped

    def test_multiresolution_support_host_vs_device(self):
        """The jit-safe ground-type mask is the exact host iteration."""
        rng = np.random.RandomState(2)
        yy, xx = np.mgrid[:32, :32]
        img = 5 * np.exp(-((yy - 16) ** 2 + (xx - 16) ** 2) / 8.0)
        img += rng.randn(32, 32) * 0.1
        coeffs = np.asarray(wavelet.starlet_transform(img, scales=3))
        sigma = 0.1
        host = wavelet.get_multiresolution_support(
            img, coeffs, sigma, K=3, image_type="ground"
        )
        dev = np.asarray(
            wavelet.multiresolution_support_jax(coeffs, sigma, K=3)
        )
        assert_array_equal(host, dev)

    def test_apply_wavelet_denoising_recovers_signal(self):
        rng = np.random.RandomState(4)
        yy, xx = np.mgrid[:32, :32]
        truth = 10 * np.exp(-((yy - 16) ** 2 + (xx - 16) ** 2) / 10.0)
        noisy = truth + rng.randn(32, 32) * 0.3
        den = wavelet.apply_wavelet_denoising(noisy, sigma=0.3, positive=True)
        assert np.all(den >= 0)
        assert np.linalg.norm(den - truth) < np.linalg.norm(noisy - truth)


# ---------------------------------------------------------------------------
# Native sequential monotonic prox vs the TPU Jacobi path
# ---------------------------------------------------------------------------
class TestSequentialMonotonicProx:
    def test_seq_matches_jacobi_path(self):
        """The native C++ sequential sweep (operator.py:62-96 semantics)
        and the device Jacobi-to-fixpoint closure agree."""
        rng = np.random.RandomState(9)
        shape = (15, 15)
        X = rng.rand(*shape).astype(np.float32) + 0.1
        X[7, 7] = 3.0
        seq = prox_ops.prox_weighted_monotonic_seq(shape, min_gradient=0.1)
        jac = prox_ops.build_prox_monotonic(shape, min_gradient=0.1)
        out_seq = np.asarray(seq(X.copy()))
        out_jac = np.asarray(jac(X.copy()))
        assert_allclose(out_seq, out_jac, rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# Measure (ref scarlet/measure.py:6-21)
# ---------------------------------------------------------------------------
class TestMeasureMaxPixel:
    def test_array_input(self):
        model = np.zeros((2, 5, 5))
        model[1, 3, 2] = 7.0
        assert measure.max_pixel(model) == (1, 3, 2)

    def test_component_offset(self):
        class FakeComponent:
            bbox = Box((1, 4, 4), origin=(0, 10, 20))

            def get_model(self):
                m = np.zeros((1, 4, 4))
                m[0, 1, 2] = 1.0
                return m

        assert measure.max_pixel(FakeComponent()) == (0, 11, 22)


# ---------------------------------------------------------------------------
# Detection wavelet coadd variants (ref scarlet/detect.py:388-440)
# ---------------------------------------------------------------------------
class TestDetectionWavelets:
    def test_get_wavelets_per_band(self):
        """Per-band masked starlets: (scales+1, bands, H, W), each band's
        plane equal to masking that band alone."""
        from scarlet_tpu import detect as det
        from scarlet_tpu.ops import wavelet

        rng = np.random.RandomState(3)
        yy, xx = np.mgrid[:32, :32]
        blob = 8 * np.exp(-((yy - 16) ** 2 + (xx - 16) ** 2) / 12.0)
        images = np.stack([blob * a for a in (1.0, 0.5)])
        images += rng.randn(*images.shape) * 0.1
        variance = np.full_like(images, 0.01)

        out = det.get_wavelets(images, variance, scales=3)
        assert out.shape == (4, 2, 32, 32)

        for b in range(2):
            coeffs = np.asarray(wavelet.starlet_transform(images[b], scales=3))
            M = wavelet.get_multiresolution_support(
                images[b], coeffs, 0.1, K=3, epsilon=1e-1, max_iter=20)
            assert_allclose(out[:, b], M * coeffs, rtol=1e-12)

        # the coadd variant masks the band sum
        det_out = det.get_detect_wavelets(images, variance, scales=3)
        assert det_out.shape == (4, 32, 32)
        assert np.any(det_out != 0)
