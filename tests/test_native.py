"""Native C++ kernels vs the pure-numpy/JAX implementations."""
import numpy as np
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from scarlet_tpu import native
from scarlet_tpu.ops import prox as prox_ops

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_prox_weighted_monotonic_matches_jax():
    rng = np.random.RandomState(3)
    shape = (15, 17)
    center = (7, 8)
    X = (rng.rand(*shape) * 10).astype(np.float32)
    weights = prox_ops.monotonic_weights(shape, "angle", center)
    didx = prox_ops.sort_by_radius(shape, center)[1:]
    offsets = np.array([dy * shape[1] + dx
                        for dy, dx in prox_ops.NEIGHBOR_OFFSETS], np.int64)

    got = native.prox_weighted_monotonic(
        X.flatten(), weights.reshape(8, -1), offsets, didx, 0.1
    ).reshape(shape)

    n_iter = prox_ops.monotonic_depth(weights, shape, center)
    expected = np.asarray(prox_ops.prox_weighted_monotonic(
        jnp.asarray(X), jnp.asarray(weights.astype(np.float32)), n_iter,
        min_gradient=0.1, center=center))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_monotonic_mask_native_equals_python():
    rng = np.random.RandomState(5)
    y, x = np.mgrid[-8:9, -8:9]
    profile = np.exp(-0.15 * np.sqrt(x ** 2 + y ** 2)).astype(np.float32)
    profile += 0.02 * rng.rand(*profile.shape).astype(np.float32)

    v1, m1, b1 = prox_ops.prox_monotonic_mask(profile, 0)

    # force the python path
    import scarlet_tpu.native as nat
    real_available = nat.available
    nat.available = lambda: False
    try:
        v2, m2, b2 = prox_ops.prox_monotonic_mask(profile, 0)
    finally:
        nat.available = real_available

    assert_array_equal(v1, v2)
    assert_allclose(m1, m2, rtol=1e-6)
    assert_array_equal(b1, b2)


def test_apply_filter_matches_convolution():
    from scarlet_tpu.ops import interpolation
    from scarlet_tpu.models.renderer import convolve as xla_convolve

    rng = np.random.RandomState(0)
    image = rng.rand(20, 22).astype(np.float32)
    kernel = rng.rand(5, 5).astype(np.float32)

    coords = interpolation.get_filter_coords(kernel)
    y_start, y_end, x_start, x_end = interpolation.get_filter_bounds(
        coords.reshape(-1, 2))
    got = native.apply_filter(image, kernel.flatten(), y_start, y_end,
                              x_start, x_end)
    expected = np.asarray(xla_convolve(image[None], kernel[None]))[0]
    assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_label_components():
    img = np.zeros((10, 12), np.float32)
    img[1:3, 1:3] = 1.0
    img[6:9, 7:10] = 2.0
    img[0, 11] = 3.0
    labels, n = native.label_components(img, 0.0)
    assert n == 3
    assert len(np.unique(labels)) == 4  # 3 labels + background
    from scipy import ndimage
    ref_labels, ref_n = ndimage.label(
        img > 0, structure=[[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    assert ref_n == n
    # same partition (labels may be permuted)
    for lab in range(1, n + 1):
        mask = labels == lab
        ref_vals = np.unique(ref_labels[mask])
        assert len(ref_vals) == 1
