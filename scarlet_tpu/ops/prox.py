"""Proximal operators, TPU-first.

All in-loop proxes are pure ``jnp`` functions that vectorize (``vmap``) over
batches of morphologies.  The reference's sequential radius-ordered
monotonicity sweep (operators_pybind11.cc:14-36) is reformulated as an exact
Jacobi fixed-point iteration (see :func:`prox_weighted_monotonic`): because a
pixel's reference neighbors are always strictly closer to the peak *and*
8-neighbors, the Gauss-Seidel sweep's fixed point is reached after at most
``max Chebyshev distance from the center`` parallel passes, each of which is
eight shifted multiply-adds — pure VPU work.

Host-side (init-time) operators that need data-dependent control flow
(flood-fill monotonic masks) live here too, implemented iteratively in numpy
(stack-based, no recursion — avoids the C-stack hazard of the reference
noted in SURVEY.md §5.2).

Behavioral references: scarlet/operator.py, scarlet/operators_pybind11.cc,
proxmin.operators (prox_hard/prox_soft/prox_unity_plus).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import fft as fft_ops
from .arrays import shift_zero
from ..cache import Cache

__all__ = [
    "prox_plus",
    "prox_hard",
    "prox_hard_plus",
    "prox_soft",
    "prox_soft_plus",
    "prox_unity",
    "prox_unity_plus",
    "threshold",
    "prox_threshold",
    "sort_by_radius",
    "monotonic_weights",
    "prox_weighted_monotonic",
    "build_prox_monotonic",
    "get_center",
    "prox_monotonic_mask",
    "monotonic_mask_device",
    "prox_cone",
    "prox_sdss_symmetry",
    "prox_soft_symmetry",
    "prox_kspace_symmetry",
    "prox_uncentered_symmetry",
    "uncentered_operator",
    "project_disk_sed",
    "project_disk_sed_mean",
    "proximal_disk_sed",
]

# 8-neighbor offsets in the reference's order (operator.py:84).
NEIGHBOR_OFFSETS = (
    (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1),
)


# ---------------------------------------------------------------------------
# Elementary proxes (proxmin.operators equivalents)
# ---------------------------------------------------------------------------
def prox_plus(X, step=0):
    """Projection onto the non-negative orthant."""
    return jnp.maximum(X, 0)


def _thresh_value(step, thresh, type):
    assert type in ("relative", "absolute")
    return thresh * step if type == "relative" else thresh


def prox_hard(X, step, thresh=0, type="absolute"):
    """Hard thresholding: zero out ``|X| < thresh``."""
    t = _thresh_value(step, thresh, type)
    return jnp.where(jnp.abs(X) < t, 0, X)


def prox_hard_plus(X, step, thresh=0, type="absolute"):
    """Hard thresholding followed by positivity."""
    return prox_plus(prox_hard(X, step, thresh=thresh, type=type))


def prox_soft(X, step, thresh=0, type="absolute"):
    """Soft thresholding: shrink towards zero by ``thresh``."""
    t = _thresh_value(step, thresh, type)
    return jnp.sign(X) * jnp.maximum(jnp.abs(X) - t, 0)


def prox_soft_plus(X, step, thresh=0, type="absolute"):
    return jnp.maximum(prox_soft(X, step, thresh=thresh, type=type), 0)


def prox_unity(X, step=0, axis=None):
    """Normalize so the sum along ``axis`` is one."""
    return X / jnp.sum(X, axis=axis, keepdims=axis is not None)


def prox_unity_plus(X, step=0, axis=None):
    return prox_unity(prox_plus(X), step, axis=axis)


# ---------------------------------------------------------------------------
# Noise-threshold prox (log-histogram cutoff)
# ---------------------------------------------------------------------------
def threshold(morph):
    """Noise cutoff from the log10 histogram of positive pixels (host/numpy,
    bit-exact with the reference).  Ref: scarlet/constraint.py:165-180.

    Returns (thresh, bins).
    """
    morph = np.asarray(morph)
    _morph = morph[morph > 0]
    _bins = 50
    if _morph.size < 500:
        _bins = max(int(_morph.size / 10), 1)
        if _bins == 1:
            return 0, _bins
    hist, bins = np.histogram(np.log10(_morph).reshape(-1), _bins)
    cutoff = np.where(hist == 0)[0]
    if len(cutoff) == 0:
        return 0, _bins
    return 10 ** bins[cutoff[-1]], _bins


def prox_threshold(X, step=0):
    """Jit-friendly equivalent of :func:`threshold` + hard-plus prox.

    Reproduces the reference semantics (including the shrinking bin count
    for small morphologies) with traced values: bin indices are computed
    arithmetically so the dynamic bin count needs no dynamic shapes.
    """
    pos = X > 0
    n = jnp.sum(pos)
    logX = jnp.where(pos, jnp.log10(jnp.where(pos, X, 1.0)), 0.0)
    lo = jnp.min(jnp.where(pos, logX, jnp.inf))
    hi = jnp.max(jnp.where(pos, logX, -jnp.inf))

    max_bins = 50
    nb = jnp.where(n < 500, jnp.clip(n // 10, 1, max_bins), max_bins)

    width = jnp.where(hi > lo, (hi - lo), 1.0)
    idx = jnp.clip(jnp.floor((logX - lo) / width * nb), 0, nb - 1).astype(jnp.int32)
    counts = jnp.zeros((max_bins,), jnp.int32).at[
        jnp.where(pos, idx, max_bins - 1).reshape(-1)
    ].add(jnp.where(pos, 1, 0).reshape(-1).astype(jnp.int32))
    # last empty bin among bins [0, nb)
    bin_ids = jnp.arange(max_bins)
    empty = (counts == 0) & (bin_ids < nb)
    cutoff = jnp.max(jnp.where(empty, bin_ids, -1))
    thresh_val = 10 ** (lo + cutoff * width / nb)
    thresh = jnp.where((cutoff < 0) | (nb <= 1) | (n == 0), 0.0, thresh_val)
    return prox_hard_plus(X, step, thresh=thresh, type="absolute")


# ---------------------------------------------------------------------------
# Weighted radial monotonicity
# ---------------------------------------------------------------------------
def sort_by_radius(shape, center=None):
    """Flat pixel indices sorted by distance from ``center``.

    Ref: scarlet/operator.py:10-48.
    """
    if center is None:
        cx = (shape[1] - 1) >> 1
        cy = (shape[0] - 1) >> 1
    else:
        cy, cx = int(center[0]), int(center[1])
    X, Y = np.meshgrid(np.arange(shape[1]) - cx, np.arange(shape[0]) - cy)
    distance = np.sqrt(X ** 2 + Y ** 2)
    return np.argsort(distance.flatten())


def monotonic_weights(shape, neighbor_weight="flat", center=None):
    """(8, H, W) neighbor weights for the radial monotonicity projection.

    For each pixel, weights over its 8 neighbors that are strictly closer to
    the ``center``; 'angle' weights by the cosine between the pixel->center
    and pixel->neighbor directions (always positive for closer neighbors),
    'flat' weighs them equally, 'nearest' one-hots the best-aligned one.
    Normalized so weights per pixel sum to 1 (except 'nearest').

    This is a direct 2D formulation of the reference's band-diagonal
    construction (scarlet/operator.py:591-667) without its flat-index
    wrap-around edge cases.
    """
    assert neighbor_weight in ("flat", "angle", "nearest")
    H, W = shape
    if center is None:
        center = ((H - 1) // 2, (W - 1) // 2)
    py, px = int(center[0]), int(center[1])

    X, Y = np.meshgrid(np.arange(W, dtype=np.float64) - px,
                       np.arange(H, dtype=np.float64) - py)
    distance = np.sqrt(X ** 2 + Y ** 2)
    # Angle of the pixel->center direction, matching the reference's
    # arctan2(-Y, -X) patched convention (operator.py:618-622).
    angles = np.arctan2(-Y, -np.where(X == 0, 0.0, X))
    on_axis = (X == 0) & (Y != 0)
    angles[on_axis] = 0.5 * np.pi * np.sign(-Y[on_axis])

    weights = np.zeros((8, H, W), dtype=np.float64)
    yy, xx = np.mgrid[0:H, 0:W]
    for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
        ny, nx = yy + dy, xx + dx
        valid = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
        nyc = np.clip(ny, 0, H - 1)
        nxc = np.clip(nx, 0, W - 1)
        closer = distance - distance[nyc, nxc] > 0
        ok = valid & closer
        rel_angle = np.arctan2(dy, dx)
        w = np.cos(angles - rel_angle)
        weights[d] = np.where(ok, w, 0.0)

    if neighbor_weight == "nearest":
        best = np.argmax(weights, axis=0)
        one_hot = np.zeros_like(weights)
        one_hot[best, yy, xx] = 1.0
        one_hot *= (weights.max(axis=0) > 0)
        one_hot[:, py, px] = 0
        return one_hot

    if neighbor_weight == "flat":
        weights = (weights != 0).astype(np.float64)
    norm = weights.sum(axis=0)
    norm[norm == 0] = 1
    return weights / norm


def _shifted(x, dy, dx):
    """n[y, x] = x[y+dy, x+dx], zero outside."""
    pad = ((max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)))
    padded = jnp.pad(x, pad)
    H, W = x.shape[-2:]
    y0 = max(0, dy)
    x0 = max(0, dx)
    return padded[..., y0:y0 + H, x0:x0 + W]


def prox_weighted_monotonic(X, weights, n_iter, min_gradient=0.1, center=None):
    """Radially monotonic projection (jit/vmap-friendly).

    Exact parallel formulation of the reference's sequential sweep
    (operators_pybind11.cc:14-36): iterate
    ``X <- min(X0, (sum_d w_d * shift_d(X)) * (1 - min_gradient))`` from the
    original ``X0``.  Reference neighbors are strictly closer to the peak, so
    the dependency graph is a DAG; after ``n_iter >= depth(DAG)`` Jacobi
    passes every pixel has recomputed its value from finalized references and
    the result equals the sequential (Gauss-Seidel-in-distance-order) sweep
    exactly.  Use :func:`monotonic_depth` for the exact minimal ``n_iter``.

    Parameters
    ----------
    X: (H, W) array
    weights: (8, H, W) from :func:`monotonic_weights`
    n_iter: static int, number of Jacobi passes
    center: (cy, cx) static ints; the center pixel is never modified
    """
    H, W = X.shape[-2:]
    if center is None:
        center = ((H - 1) // 2, (W - 1) // 2)
    cy, cx = int(center[0]), int(center[1])
    keep_center = jnp.zeros((H, W), bool).at[cy, cx].set(True)
    scale = jnp.asarray(1.0 - min_gradient, X.dtype)
    weights = jnp.asarray(weights, X.dtype)
    X0 = X

    def body(_, x):
        ref = jnp.zeros_like(x)
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            ref = ref + weights[d] * _shifted(x, dy, dx)
        new = jnp.minimum(X0, ref * scale)
        return jnp.where(keep_center, X0, new)

    return jax.lax.fori_loop(0, n_iter, body, X0)


def monotonic_depth(weights, shape, center):
    """Depth of the monotonicity reference DAG = exact number of Jacobi
    passes needed for :func:`prox_weighted_monotonic` to reproduce the
    sequential sweep.  Host-side, cached by the builder.
    """
    H, W = shape
    w = np.asarray(weights) > 0
    order = sort_by_radius(shape, center)
    depth = np.zeros(H * W, dtype=np.int64)
    for flat in order:
        y, x = divmod(int(flat), W)
        best = -1
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            if w[d, y, x]:
                best = max(best, depth[(y + dy) * W + (x + dx)])
        depth[flat] = best + 1
    return int(depth.max())


def build_prox_monotonic(shape, neighbor_weight="flat", min_gradient=0.1,
                         center=None):
    """Build a monotonicity prox ``f(X, step) -> X`` for a fixed shape/center.

    Weight construction is cached (it is the expensive part, mirroring the
    reference's Cache usage in constraint.py:210-223).
    """
    H, W = shape
    if center is None:
        center = ((H - 1) // 2, (W - 1) // 2)
    cy, cx = int(center[0]), int(center[1])
    key = (tuple(shape), (cy, cx), neighbor_weight, float(min_gradient))
    try:
        weights_np, n_iter = Cache.check("monotonic_weights", key)
    except KeyError:
        weights_np = monotonic_weights(shape, neighbor_weight, center)
        n_iter = monotonic_depth(weights_np, shape, (cy, cx))
        # cache host (numpy) arrays only: device constants created inside a
        # jit trace are trace-local and must not leak across traces
        Cache.set("monotonic_weights", key, (weights_np, n_iter))

    def prox(X, step=0):
        return prox_weighted_monotonic(
            X, jnp.asarray(weights_np), n_iter, min_gradient=min_gradient,
            center=(cy, cx)
        )

    return prox


# ---------------------------------------------------------------------------
# Monotonic mask (flood fill from the center) — host-side, init-time
# ---------------------------------------------------------------------------
def get_center(image, center, radius=1):
    """Search a (2r+1)^2 window around ``center`` for the peak pixel.

    Ref: scarlet/operator.py:99-129.
    """
    image = np.asarray(image)
    cy, cx = int(center[0]), int(center[1])
    y0 = max(cy - radius, 0)
    x0 = max(cx - radius, 0)
    subset = image[y0:cy + radius + 1, x0:cx + radius + 1]
    c = np.unravel_index(np.argmax(subset), subset.shape)
    return c[0] + y0, c[1] + x0


def _flood_monotonic(image, i, j, unchecked, orphans, variance, bounds, thresh=0.0):
    """Iterative (explicit-stack) equivalent of the reference's recursive
    flood fill (detecting pixels monotonic along some path from the center).
    Ref: scarlet/operators_pybind11.cc:61-124.
    """
    H, W = image.shape
    stack = [(i, j)]
    while stack:
        ci, cj = stack.pop()
        for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ni, nj = ci + di, cj + dj
            if not (0 <= ni < H and 0 <= nj < W) or not unchecked[ni, nj]:
                continue
            if image[ni, nj] < image[ci, cj] + variance and image[ni, nj] > thresh:
                unchecked[ni, nj] = False
                orphans[ni, nj] = False
                bounds[0] = min(bounds[0], ni)
                bounds[1] = max(bounds[1], ni)
                bounds[2] = min(bounds[2], nj)
                bounds[3] = max(bounds[3], nj)
                stack.append((ni, nj))
            else:
                orphans[ni, nj] = True


def _interpolate_orphans(all_i, all_j, unchecked, model, orphans, variance, bounds):
    """Fill non-monotonic 'orphans' from neighbor gradients, then continue
    the flood fill from them.  Ref: operators_pybind11.cc:127-232.
    """
    H, W = model.shape
    for i, j in zip(all_i, all_j):
        if not unchecked[i, j]:
            continue
        unchecked[i, j] = False
        total = 0.0
        valid_count = 0
        had_unchecked = False
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            i2, j2 = i + 2 * di, j + 2 * dj
            i1, j1 = i + di, j + dj
            if not (0 <= i2 < H and 0 <= j2 < W):
                continue
            if model[i2, j2] > model[i1, j1]:
                if unchecked[i2, j2] or unchecked[i1, j1]:
                    had_unchecked = True
                else:
                    grad = model[i2, j2] - model[i1, j1]
                    total += model[i1, j1] - grad
                    valid_count += 1
        if total > 0:
            model[i, j] = total / valid_count
            orphans[i, j] = False
            bounds[0] = min(bounds[0], i)
            bounds[1] = max(bounds[1], i)
            bounds[2] = min(bounds[2], j)
            bounds[3] = max(bounds[3], j)
            _flood_monotonic(model, i, j, unchecked, orphans, variance, bounds)
        elif had_unchecked:
            pass
        else:
            orphans[i, j] = True
            model[i, j] = 0


def monotonic_mask_device(X, center, center_radius=1, variance=0.0):
    """Device (jit/vmap-safe) monotonic reachability mask: the exact set of
    pixels reachable from the peak through 4-connected paths with
    non-increasing (within ``variance``) positive values.

    The reference computes this with an order-dependent flood fill
    (operators_pybind11.cc:61-124 / _flood_monotonic), but acceptance
    depends only on the ORIGINAL pixel values and the validity of a
    4-neighbor, so the accepted set is the monotone closure — a
    fixed-point of boolean propagation, which this computes with a
    ``lax.while_loop`` of vectorized passes (exact, order-independent;
    equivalent to ``prox_monotonic_mask(..., max_iter=0)`` without orphan
    interpolation).  Returns ``(valid, model)`` with
    ``model = X * valid``; ``center`` may be a traced (y, x) pair.
    """
    X = jnp.asarray(X)
    H, W = X.shape
    cy = jnp.asarray(center[0], jnp.int32)
    cx = jnp.asarray(center[1], jnp.int32)
    if center_radius > 0:
        r = int(center_radius)
        # peak search window (operator.py:99-129), clipped at the low edge
        y0 = jnp.maximum(cy - r, 0)
        x0 = jnp.maximum(cx - r, 0)
        win = jax.lax.dynamic_slice(
            jnp.pad(X, ((0, 2 * r), (0, 2 * r)),
                    constant_values=-jnp.inf),
            (y0, x0), (2 * r + 1, 2 * r + 1))
        # mask out columns/rows past the true (unclipped) high edge
        yy, xx = jnp.mgrid[0:2 * r + 1, 0:2 * r + 1]
        ok = ((y0 + yy <= cy + r) & (x0 + xx <= cx + r)
              & (y0 + yy < H) & (x0 + xx < W))
        win = jnp.where(ok, win, -jnp.inf)
        k = jnp.argmax(win.reshape(-1))
        cy = y0 + k // (2 * r + 1)
        cx = x0 + k % (2 * r + 1)

    yy, xx = jnp.mgrid[0:H, 0:W]
    valid0 = (yy == cy) & (xx == cx)
    pos = X > 0

    center_mask = valid0

    def passes(state):
        valid, _ = state
        new = valid
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nb_valid = shift_zero(valid, dy, dx)
            nb_val = shift_zero(X, dy, dx)
            new = new | (nb_valid & (X < nb_val + variance) & pos)
        return new | center_mask, jnp.any(new != valid)

    def cond(state):
        return state[1]

    def body(state):
        return passes(state)

    valid, _ = jax.lax.while_loop(cond, body, (valid0, jnp.asarray(True)))
    return valid, X * valid


def prox_monotonic_mask(X, step=0, center=None, center_radius=1, variance=0.0,
                        max_iter=3):
    """Keep only pixels reachable monotonically from the center; returns
    ``(valid, model, bounds)``.  Host-side (init-time use); uses the native
    C++ flood fill when available (scarlet_tpu.native), numpy otherwise.

    Ref: scarlet/operator.py:132-180.
    """
    X = np.asarray(X)
    if center is None:
        center = (X.shape[0] // 2, X.shape[1] // 2)
    if center_radius > 0:
        i, j = get_center(X, center, center_radius)
    else:
        i, j = int(np.round(center[0])), int(np.round(center[1]))

    from .. import native

    if native.available():
        unchecked = np.ones(X.shape, dtype=np.uint8)
        unchecked[i, j] = 0
        orphans = np.zeros(X.shape, dtype=np.uint8)
        bounds = np.array([i, i, j, j], dtype=np.int32)
        X32 = np.ascontiguousarray(X, np.float32)
        native.get_valid_monotonic_pixels(X32, i, j, unchecked, orphans,
                                          variance, bounds)
        model = X32.copy()
        it = 0
        while np.sum((orphans > 0) & (unchecked > 0)) > 0 and it < max_iter:
            it += 1
            all_i, all_j = np.where(orphans > 0)
            native.linear_interpolate_invalid_pixels(
                all_i, all_j, unchecked, model, orphans, variance, True,
                bounds)
        valid = (unchecked == 0) & (orphans == 0)
        return valid, (model * valid).astype(X.dtype), bounds

    unchecked = np.ones(X.shape, dtype=bool)
    unchecked[i, j] = False
    orphans = np.zeros(X.shape, dtype=bool)
    bounds = np.array([i, i, j, j], dtype=np.int32)
    _flood_monotonic(X, i, j, unchecked, orphans, variance, bounds)
    model = X.copy()

    it = 0
    while np.sum(orphans & unchecked) > 0 and it < max_iter:
        it += 1
        all_i, all_j = np.where(orphans)
        _interpolate_orphans(all_i, all_j, unchecked, model, orphans, variance,
                             bounds)
    valid = ~unchecked & ~orphans
    model = model * valid
    return valid, model, bounds


# ---------------------------------------------------------------------------
# Symmetry
# ---------------------------------------------------------------------------
def prox_sdss_symmetry(X, step=0):
    """min(X, 180deg-rotated X). Ref: operator.py:263-271."""
    return jnp.minimum(X, X[::-1, ::-1])


def prox_soft_symmetry(X, step=0, strength=1):
    """Soft symmetry: blend with the 180deg rotation by ``strength``.

    Even shapes are padded by one so the rotation center is a pixel.
    Ref: operator.py:274-293.
    """
    H, W = X.shape
    pads = [[0, 0], [0, 0]]
    slices = [slice(None), slice(None)]
    if H % 2 == 0:
        pads[0][1] = 1
        slices[0] = slice(0, H)
    if W % 2 == 0:
        pads[1][1] = 1
        slices[1] = slice(0, W)
    Xp = jnp.pad(X, pads)
    Xs = Xp[::-1, ::-1]
    out = 0.5 * strength * (Xp + Xs) + (1 - strength) * Xp
    return out[tuple(slices)]


def prox_kspace_symmetry(X, step=0, shift=None, padding=10):
    """Symmetrize under a fractional shift by discarding the imaginary part
    in Fourier space.  Ref: operator.py:296-332.
    """
    fft_shape = fft_ops.good_fft_shape(X, X, padding=padding)
    dy, dx = shift
    zero_mask = X <= 0

    X_fft = fft_ops.transform(X, fft_shape, (0, 1))
    shifter_y, shifter_x = fft_ops.mk_shifter(fft_shape)

    result_fft = X_fft * jnp.exp(shifter_y[:, None] * (-dy))
    result_fft = result_fft * jnp.exp(shifter_x[None, :] * (-dx))
    result_fft = result_fft.real.astype(X_fft.dtype)
    result_fft = result_fft * jnp.exp(shifter_y[:, None] * dy)
    result_fft = result_fft * jnp.exp(shifter_x[None, :] * dx)

    result = fft_ops.inverse_transform(result_fft, fft_shape, X.shape, (0, 1))
    return jnp.where(zero_mask, 0.0, jnp.real(result))


def uncentered_operator(X, func, center=None, fill=None, **kwargs):
    """Apply ``func`` only on the largest centered sub-window around
    ``center``.  Ref: operator.py:207-260.  ``center`` must be static.
    """
    if center is None:
        X_host = np.asarray(X)
        py, px = np.unravel_index(np.argmax(X_host), X_host.shape)
    else:
        py, px = center
    cy, cx = np.array(X.shape) // 2

    if py == cy and px == cx:
        return func(X, **kwargs)

    dy = int(2 * (py - cy))
    dx = int(2 * (px - cx))
    if not X.shape[0] % 2:
        dy += 1
    if not X.shape[1] % 2:
        dx += 1
    xslice = slice(None, dx) if dx < 0 else slice(dx, None)
    yslice = slice(None, dy) if dy < 0 else slice(dy, None)

    sub = func(X[yslice, xslice], **kwargs)
    if fill is not None:
        out = jnp.full(X.shape, fill, X.dtype)
    else:
        out = X
    return out.at[yslice, xslice].set(sub)


def prox_uncentered_symmetry(X, step=0, center=None, algorithm="kspace",
                             fill=None, shift=None, strength=0.5):
    """Symmetry about an off-center peak. Ref: operator.py:335-400."""
    if algorithm == "kspace" and (shift is None or np.all(np.asarray(shift) == 0)):
        algorithm = "soft"
        strength = 1
    if algorithm == "kspace":
        return uncentered_operator(
            X, prox_kspace_symmetry, center, shift=shift, step=step, fill=fill
        )
    if algorithm == "sdss":
        return uncentered_operator(X, prox_sdss_symmetry, center, step=step,
                                   fill=fill)
    if algorithm == "soft":
        return uncentered_operator(
            X, prox_soft_symmetry, center, step=step, strength=strength, fill=fill
        )
    raise ValueError(
        f"algorithm must be one of 'soft', 'sdss', 'kspace', received '{algorithm}'"
    )


# ---------------------------------------------------------------------------
# Cone projection (host-side, specialty). Ref: operator.py:183-204, 403-447.
# ---------------------------------------------------------------------------
def _proj(A, B):
    """Projection of A onto the hyperplane defined by B."""
    return A - (A * B).sum() * B / (B ** 2).sum()


def _proj_dist(A, B):
    """Length of the projection of A onto B."""
    return (A * B).sum() / (B ** 2).sum() ** 0.5


def _use_relevant_dim(Y, Q, Vs, index):
    projector = Vs[index]
    del Vs[index]
    Y = _proj(Y, projector)
    Q = _proj(Y, projector)
    for i in range(len(Vs)):
        Vs[i] = _proj(Vs[i], projector)
    return Y, Q, Vs


def _find_relevant_dim(Y, Q, Vs):
    max_t = 0
    index = -1
    for i in range(len(Vs)):
        Y_p = _proj_dist(Y, Vs[i])
        Q_p = _proj_dist(Q, Vs[i])
        if Y_p < 0 and Q_p != Y_p:
            t = -Y_p / (Q_p - Y_p)
        else:
            t = -2
        if t > max_t:
            max_t = t
            index = i
    return index


def _find_Q(Vs, n):
    res = np.zeros(n)
    res[int((n - 1) / 2)] = n
    return res


def prox_cone(X, step=0, G=None):
    """Exact projection of the rows of X onto the cone {x : Gx >= 0}.

    Ref: operator.py:183-204.
    """
    X = np.array(X, copy=True)
    k, n = X.shape
    for i in range(k):
        Y = X[i]
        Vs = [G[j] for j in range(n)]
        Q = _find_Q(Vs, n)
        for _ in range(n):
            index = _find_relevant_dim(Y, Q, Vs)
            if index != -1:
                Y, Q, Vs = _use_relevant_dim(Y, Q, Vs, index)
            else:
                break
        X[i] = Y
    return X


# ---------------------------------------------------------------------------
# Bulge/disk SED projections (host-side, specialty)
# ---------------------------------------------------------------------------
def project_disk_sed_mean(bulge_sed, disk_sed):
    """Project the disk SED to be bluer than the bulge (mean-slope variant).

    Ref: operator.py:450-472.
    """
    bulge_sed = np.asarray(bulge_sed)
    new_sed = np.array(disk_sed, copy=True)
    diff = bulge_sed - new_sed
    slope = (diff[-1] - diff[0]) / (len(bulge_sed) - 1)
    for s in range(1, len(diff) - 1):
        if diff[s] < diff[s - 1]:
            new_sed[s] = bulge_sed[s] - (slope * s + diff[0])
            diff[s] = bulge_sed[s] - new_sed[s]
    return new_sed


def project_disk_sed(bulge_sed, disk_sed):
    """Project the disk SED to be bluer than the bulge (running-difference
    variant).  Ref: operator.py:475-497.
    """
    bulge_sed = np.asarray(bulge_sed)
    new_sed = np.array(disk_sed, copy=True)
    diff = bulge_sed - new_sed
    for s in range(1, len(diff) - 1):
        if diff[s] < diff[s - 1]:
            new_sed[s] = new_sed[s] + diff[s - 1]
            diff[s] = diff[s - 1]
    return new_sed


def proximal_disk_sed(X, step, peaks, algorithm=project_disk_sed_mean):
    """Make each disk SED bluer than its bulge SED, then project to the
    unit simplex.  Ref: operator.py:500-509.
    """
    X = np.array(X, copy=True)
    for peak in peaks.peaks:
        if "disk" in peak.components and "bulge" in peak.components:
            bulge_k = peak["bulge"].index
            disk_k = peak["disk"].index
            X[:, disk_k] = algorithm(X[:, bulge_k], X[:, disk_k])
    return np.asarray(prox_unity_plus(jnp.asarray(X), step, axis=0))


# ---------------------------------------------------------------------------
# Flat-form compatibility helpers (the reference's band-diagonal weight
# construction API; operator.py:512-667).  The native construction here is
# the 2D `monotonic_weights`; these wrappers expose the flattened forms.
# ---------------------------------------------------------------------------
def getOffsets(width, coords=None):
    """Flat-index offsets + band slices for the 8-neighbor bands.

    Ref: operator.py:512-527.
    """
    if coords is None:
        coords = list(NEIGHBOR_OFFSETS)
    offsets = [width * y + x for y, x in coords]
    slices = [slice(None, s) if s < 0 else slice(s, None) for s in offsets]
    slices_inv = [slice(-s, None) if s < 0 else slice(None, -s)
                  for s in offsets]
    return offsets, slices, slices_inv


def diagonalizeArray(arr, shape=None, dtype=np.float64):
    """(8, N) array of each pixel's neighbor values (band-diagonal form)
    plus the out-of-bounds mask.  Ref: operator.py:530-572; this version
    masks *all* row-wrap neighbors (the reference misses one case per row
    for the (1,1) band, see SURVEY.md §2 #7 note).
    """
    arr = np.asarray(arr)
    if shape is None:
        height, width = arr.shape
        data = arr
    elif arr.ndim == 1:
        height, width = shape
        data = arr.reshape(height, width)
    else:
        raise ValueError("Expected either a 2D array or a 1D array + shape")

    diagonals = np.zeros((8, height * width), dtype=dtype)
    mask = np.ones((8, height * width), dtype=bool)
    yy, xx = np.mgrid[0:height, 0:width]
    for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
        ny, nx = yy + dy, xx + dx
        valid = (ny >= 0) & (ny < height) & (nx >= 0) & (nx < width)
        vals = np.zeros((height, width), dtype=dtype)
        vals[valid] = data[ny[valid], nx[valid]]
        diagonals[d] = vals.ravel()
        mask[d] = ~valid.ravel()
    return diagonals, mask


def getRadialMonotonicWeights(shape, neighbor_weight="flat", center=None):
    """(8, N) flat-form radial monotonicity weights.

    Ref: operator.py:591-667; computed from the 2D-native construction.
    """
    w = monotonic_weights(shape, neighbor_weight=neighbor_weight,
                          center=center)
    return w.reshape(8, -1)


def prox_weighted_monotonic_seq(shape, neighbor_weight="flat",
                                min_gradient=0.1, center=None):
    """Build the reference-style *sequential* monotonicity prox (native C++
    sweep), mirroring operator.py:62-96.  Useful as a CPU reference; the
    TPU path is :func:`build_prox_monotonic`.
    """
    from .. import native

    height, width = shape
    didx = sort_by_radius(shape, center)[1:]
    offsets = np.array([width * y + x for y, x in NEIGHBOR_OFFSETS], np.int64)
    weights = getRadialMonotonicWeights(shape,
                                        neighbor_weight=neighbor_weight,
                                        center=center)

    def prox(X, step=0):
        flat = native.prox_weighted_monotonic(
            np.asarray(X, np.float32).flatten(), weights, offsets, didx,
            min_gradient)
        return flat.reshape(shape)

    return prox
