"""Interpolation/resampling unit tests, mirroring the reference's
tests/test_interpolation.py coverage: projection slices for every shape
parity, 1D kernels at exact points, separable kernels, sinc resampling
identities, Fourier shifting, PSF size."""
import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from scarlet_tpu.ops import interpolation as interp
from scarlet_tpu.ops import fft as fft_ops


# ---------------------------------------------------------------------------
# Projections (reference tests/test_interpolation.py:17-195)
# ---------------------------------------------------------------------------
def test_project_image_all_parities():
    """Projecting into larger/smaller frames preserves the centered content
    for every odd/even shape-parity combination."""
    for ih, iw in [(3, 3), (3, 4), (4, 3), (4, 4)]:
        img = np.arange(ih * iw, dtype=np.float64).reshape(ih, iw) + 1
        for oh, ow in [(7, 7), (7, 8), (8, 7), (8, 8)]:
            out = np.asarray(interp.project_image(jnp.asarray(img),
                                                  (oh, ow)))
            assert out.shape == (oh, ow)
            assert out.sum() == img.sum()
            # round trip back to the original shape recovers the image
            back = np.asarray(interp.project_image(jnp.asarray(out),
                                                   (ih, iw)))
            assert_allclose(back, img)


def test_project_image_trim():
    """Projecting into a smaller frame trims symmetrically around the
    center pixel."""
    img = np.zeros((9, 9))
    img[4, 4] = 1.0
    out = np.asarray(interp.project_image(jnp.asarray(img), (5, 5)))
    assert out[2, 2] == 1.0
    assert out.sum() == 1.0


def test_common_projections():
    a = jnp.ones((3, 5))
    b = jnp.ones((7, 3))
    pa, pb = interp.common_projections(a, b)
    assert pa.shape == pb.shape == (7, 5)
    assert float(jnp.sum(pa)) == 15 and float(jnp.sum(pb)) == 21


# ---------------------------------------------------------------------------
# 1D kernels (reference tests/test_interpolation.py kernel sections)
# ---------------------------------------------------------------------------
def test_kernels_at_zero_shift():
    """At dx=0 every interpolating kernel is a discrete delta."""
    for kernel in (interp.bilinear, interp.cubic_spline, interp.catmull_rom,
                   interp.lanczos, interp.quintic_spline):
        y, window = kernel(0.0)
        y = np.asarray(y, dtype=float)
        window = np.asarray(window, dtype=int)
        assert_allclose(y[window == 0], 1.0, atol=1e-12)
        assert_allclose(y[window != 0], 0.0, atol=1e-12)
    # mitchel_netravali (a=b=1/3) is smoothing, not interpolating: it need
    # not be a delta, but it must still sum to 1
    y, _ = interp.mitchel_netravali(0.0)
    assert_allclose(np.sum(y), 1.0, atol=1e-12)


def test_kernels_partition_of_unity():
    """Interpolation weights sum to 1 for any fractional shift."""
    for dx in (-0.75, -0.3, 0.2, 0.5, 0.99):
        for kernel in (interp.bilinear, interp.cubic_spline,
                       interp.catmull_rom, interp.mitchel_netravali,
                       interp.quintic_spline):
            y, _ = kernel(dx)
            assert_allclose(np.sum(y), 1.0, atol=1e-10)


def test_bilinear_values():
    y, window = interp.bilinear(0.25)
    assert_allclose(y, [0.75, 0.25])
    assert list(window) == [0, 1]
    y, window = interp.bilinear(-0.25)
    assert_allclose(y, [0.25, 0.75])
    assert list(window) == [-1, 0]


def test_lanczos_window_size():
    for a in (2, 3, 5):
        y, window = interp.lanczos(0.4, a=a)
        assert len(y) == 2 * a
        assert len(window) == 2 * a


def test_kernel_domain_validation():
    for kernel in (interp.bilinear, interp.cubic_spline, interp.lanczos):
        try:
            kernel(1.5)
            raise AssertionError("expected ValueError for |dx| > 1")
        except ValueError:
            pass


def test_separable_kernel_is_outer_product():
    ky, wy = interp.lanczos(0.3)
    kx, wx = interp.lanczos(-0.6)
    kyx, wy2, wx2 = interp.get_separable_kernel(0.3, -0.6,
                                                kernel=interp.lanczos)
    assert_allclose(np.asarray(kyx), np.outer(ky, kx), atol=1e-12)
    assert list(wy2) == list(wy) and list(wx2) == list(wx)


# ---------------------------------------------------------------------------
# Band-limited (sinc) resampling
# ---------------------------------------------------------------------------
def _bandlimited_image(H, W, sigma=3.0):
    """A smooth (effectively band-limited) Gaussian test image."""
    y, x = np.mgrid[0:H, 0:W].astype(float)
    cy, cx = (H - 1) / 2, (W - 1) / 2
    return np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * sigma ** 2))


def test_sinc_interp_identity():
    """Resampling onto the same axis grids is the identity."""
    H = W = 24
    img = _bandlimited_image(H, W)
    y = np.arange(H, dtype=float)
    x = np.arange(W, dtype=float)
    out = np.asarray(interp.sinc_interp(
        jnp.asarray(img[None]), (y, x), (y, x))[0])
    assert_allclose(out, img, atol=1e-6)


def test_sinc_interp_upsample_flux():
    """2x band-limited upsampling interpolates exactly at original nodes."""
    H = W = 16
    img = _bandlimited_image(H, W, sigma=3.0)
    y = np.arange(H, dtype=float)
    y_hr = np.arange(0, H, 0.5)
    out = np.asarray(interp.sinc_interp(
        jnp.asarray(img[None]), (y_hr, y_hr), (y, y))[0])
    assert out.shape == (2 * H, 2 * W)
    assert_allclose(out[::2, ::2], img, atol=1e-6)


def test_sinc2D_delta():
    """sinc2D (outer product of column x row sincs) at integer offsets is
    a Kronecker delta."""
    y = np.arange(-3, 4, dtype=float)
    m = np.asarray(interp.sinc2D(jnp.asarray(y[:, None]),
                                 jnp.asarray(y[None, :])))
    assert m.shape == (7, 7)
    assert_allclose(m[3, 3], 1.0, atol=1e-12)
    m2 = m.copy()
    m2[3, 3] = 0
    assert np.max(np.abs(m2)) < 1e-12


def test_fourier_shift_integer_equals_roll():
    """Fourier shift by whole pixels equals a circular roll."""
    H = W = 16
    img = _bandlimited_image(H, W, sigma=2.0).astype(np.float64)
    shifted = np.asarray(fft_ops.shift(jnp.asarray(img), (3.0, -2.0),
                                       return_fourier=False))
    # the FFT frame is zero-padded, so compare away from the wrap edges
    expect = np.roll(img, (3, -2), axis=(0, 1))
    assert_allclose(shifted[4:-4, 4:-4], expect[4:-4, 4:-4], atol=1e-8)


def test_fourier_shift_half_pixel_roundtrip():
    img = _bandlimited_image(17, 17, sigma=2.5).astype(np.float64)
    once = fft_ops.shift(jnp.asarray(img), (0.5, -0.25))
    back = np.asarray(fft_ops.shift(once, (-0.5, 0.25),
                                    return_fourier=False))
    assert_allclose(back, img, atol=1e-8)


def test_get_psf_size_gaussian():
    """FWHM-area size estimate of a Gaussian is the 3-sigma radius
    (interpolation.py:708-739: 3 * FWHM / (2 sqrt(2 ln 2)) = 3 sigma)."""
    sigma = 2.0
    psf = _bandlimited_image(41, 41, sigma=sigma)
    size = float(interp.get_psf_size(psf / psf.sum()))
    assert abs(size - 3 * sigma) / (3 * sigma) < 0.1


def test_subsample_trapezoid_gaussian():
    """Trapezoid-rule pixel integration of a Gaussian matches the analytic
    pixel-integrated shape (the reference's 0.4 corner weight makes the
    absolute scale 1.6x a true trapezoid rule, so compare normalized)."""
    from scipy import special

    sigma = 1.5
    y = np.arange(-5, 6, dtype=float)

    def f(yy, xx):
        r2 = yy[:, None] ** 2 + xx[None, :] ** 2
        return np.exp(-r2 / (2 * sigma ** 2)) / (2 * np.pi * sigma ** 2)

    got = np.asarray(interp.apply_2D_trapezoid_rule(y, y, f, 10))
    s2 = np.sqrt(2) * sigma
    cdf = 0.5 * (special.erf((y + 0.5) / s2) - special.erf((y - 0.5) / s2))
    expected = np.outer(cdf, cdf)
    assert_allclose(got / got.sum(), expected / expected.sum(),
                    rtol=5e-3, atol=1e-7)
