"""Device-side peak detection: raw pixel stacks -> source catalogs.

The reference detects sources on the host before any fitting: a starlet
transform of the band-sum image is significance-masked
(``get_detect_wavelets``, ref detect.py:420-440), the 2nd wavelet scale
is segmented into 4-connected footprints with ``min_area=4`` (ref
detect_pybind11.cc:241-280), and each footprint's strict 8-neighbor
local maxima become the peak catalog (ref detect_pybind11.cc:104-195,
detect.py:517-572).  That C++ path is recursive flood fill + per-patch
loops — host-only by construction.

This module is the TPU-native equivalent: the whole recipe as ONE
jit/vmap-safe XLA program so the production stream can run raw pixels ->
catalog -> fluxes with zero per-blend host work.  The non-trivial part
is connected-component labeling without scatter or recursion:

* each above-threshold pixel starts labeled with its own flat index;
* a ``lax.while_loop`` alternates 4-neighbor label minimization with
  two pointer-jumping passes (``label <- label_of(label)`` — each
  label is a pixel index, so a gather hops to the current root
  candidate).  Pointer jumping halves path lengths, so the loop
  converges in O(log diameter) sweeps instead of O(diameter);
* per-component area and bounding boxes come from ``jax.ops.segment_*``
  over the settled labels (labels are flat pixel indices, so the
  segment id space is the pixel grid — no compaction needed).

Peak semantics match the host exactly (tests/test_detect_device.py
asserts set equality on the bundled HSC blend and on random scenes):
a pixel is a peak iff it is positive in the masked scale-1 plane, no
8-neighbor *of the same component* has a value >= its own (the host
compares against component-masked patches, so other components never
block), and its component passes ``count >= min_area`` and
``bbox_h*bbox_w > min_area``.  Peaks are returned brightest-first via
``lax.top_k`` into a fixed (max_peaks, 2) slot layout with an active
mask — the exact catalog layout ``stream_setup`` consumes.
"""
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import wavelet as wavelet_ops

__all__ = ["detect_peaks_device", "label_components_device",
           "peak_mask_from_plane"]


def _shift_fill(x, dy, dx, fill):
    """out[y, x] = x[y + dy, x + dx], with ``fill`` outside the frame.

    Static shifts only (dy, dx in {-1, 0, 1}): pad-and-slice, which XLA
    fuses; no gathers.
    """
    H, W = x.shape
    padded = jnp.pad(x, 1, constant_values=fill)
    return lax.dynamic_slice(padded, (1 + dy, 1 + dx), (H, W))


def _label_pass(lab, pos, sent):
    """One labeling sweep: 4-neighbor min + two pointer-jump hops.

    ``sent`` is the background sentinel H*W (one past the last flat
    pixel index)."""
    H, W = lab.shape
    m = lab
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        m = jnp.minimum(m, _shift_fill(lab, dy, dx, sent))
    lab = jnp.where(pos, m, sent)
    flat = lab.ravel()
    for _ in range(2):
        # label values are flat pixel indices: gather the label of the
        # pixel each label points at (its current root candidate); root
        # labels only ever decrease, so min() is exact
        hop = jnp.take(flat, jnp.minimum(flat, sent - 1))
        flat = jnp.where(flat < sent, jnp.minimum(flat, hop), sent)
    return flat.reshape(H, W)


def label_components_device(pos):
    """4-connected component labels of a boolean (H, W) mask, on device.

    Returns (H, W) int32: every pixel of a component carries the
    component's minimal flat index; background pixels carry H*W.  The
    partition matches ``scipy.ndimage.label`` with the plus-shaped
    structuring element (ref detect_pybind11.cc:61-124's flood fill).
    """
    pos = jnp.asarray(pos, bool)
    H, W = pos.shape
    sent = jnp.int32(H * W)
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lab0 = jnp.where(pos, idx, sent)

    def cond(carry):
        return carry[1]

    def body(carry):
        lab, _ = carry
        new = _label_pass(lab, pos, sent)
        return new, jnp.any(new != lab)

    lab, _ = lax.while_loop(cond, body, (lab0, jnp.asarray(True)))
    return lab


def _masked_median_sigma(variance, validb):
    """Median of sqrt(variance) over valid pixels of all bands — the
    host's ``np.median(np.sqrt(variance))`` (ref detect.py:424) with
    zero-padded heterogeneous crops excluded."""
    C = variance.shape[0]
    sq = jnp.where(validb[None], jnp.sqrt(variance), jnp.inf)
    flat = jnp.sort(sq.ravel())
    nv = (C * jnp.sum(validb)).astype(jnp.int32)
    return 0.5 * (flat[(nv - 1) // 2] + flat[nv // 2])


def peak_mask_from_plane(plane, validb=None, min_area=4,
                         return_labels=False):
    """Boolean peak mask of one detection plane: 4-connected footprints
    above 0 with the reference's ``min_area`` cut, strict 8-neighbor
    component-masked local maxima (ref detect_pybind11.cc:104-195,
    241-280).  The segmentation stage of :func:`detect_peaks_device`,
    exposed for direct parity testing against ``detect.get_footprints``
    on arbitrary planes.  ``return_labels`` also returns the component
    label image (for per-footprint post-processing like min-separation
    culling)."""
    plane = jnp.asarray(plane)
    if validb is None:
        validb = jnp.ones(plane.shape, bool)
    H, W = plane.shape
    N = H * W
    pos = (plane > 0) & validb
    lab = label_components_device(pos)

    # per-component area + bounding box (labels are flat pixel indices,
    # background = N): ref detect_pybind11.cc:241-280's min_area filter
    flat_lab = lab.ravel()
    counts = jax.ops.segment_sum(pos.ravel().astype(jnp.int32), flat_lab,
                                 num_segments=N + 1)
    ys = (jnp.arange(N, dtype=jnp.int32) // W)
    xs = (jnp.arange(N, dtype=jnp.int32) % W)
    ymin = jax.ops.segment_min(ys, flat_lab, num_segments=N + 1)
    ymax = jax.ops.segment_max(ys, flat_lab, num_segments=N + 1)
    xmin = jax.ops.segment_min(xs, flat_lab, num_segments=N + 1)
    xmax = jax.ops.segment_max(xs, flat_lab, num_segments=N + 1)
    bbox_area = (ymax - ymin + 1) * (xmax - xmin + 1)
    keep = (counts >= min_area) & (bbox_area > min_area)

    # strict 8-neighbor local maxima against component-masked values:
    # a neighbor blocks only if it belongs to the SAME component and is
    # >= (the host's patch zeroes other components, and patch values are
    # positive, so cross-component neighbors never block — ref
    # detect_pybind11.cc:104-195 via detect.py get_footprints patches)
    blocked = jnp.zeros_like(pos)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nl = _shift_fill(lab, dy, dx, jnp.int32(-1))
            nv = _shift_fill(plane, dy, dx, jnp.asarray(0, plane.dtype))
            blocked |= (nl == lab) & (nv >= plane)
    mask = pos & ~blocked & jnp.take(keep, lab).reshape(H, W)
    return (mask, lab) if return_labels else mask


def _cull_min_separation(ys, xs, labs, valid, min_separation):
    """Brightness-greedy min-separation culling of candidate peaks
    (already sorted brightest-first): a peak survives unless an
    already-kept BRIGHTER peak of the SAME footprint lies within
    ``min_separation`` (ref detect_pybind11.cc:104-195 — the reference
    culls within each footprint's peak list, never across footprints).
    """
    M = ys.shape[0]
    min_sep2 = float(min_separation) ** 2
    idx = jnp.arange(M)

    def body(k, kept):
        d2 = ((ys - ys[k]) ** 2 + (xs - xs[k]) ** 2).astype(jnp.float32)
        conflict = jnp.any(kept & (idx < k) & (labs == labs[k])
                           & (d2 < min_sep2))
        return kept.at[k].set(valid[k] & ~conflict)

    return lax.fori_loop(0, M, body, jnp.zeros(M, bool))


def _detect_peaks_one(images, variance, scene_valid, *, max_peaks,
                      scales, min_area, peak_scale, min_separation):
    validb = scene_valid > 0.5
    detect_sum = jnp.where(validb, jnp.sum(images, 0), 0.0)
    sigma = _masked_median_sigma(variance, validb)
    coeffs = wavelet_ops.starlet_transform(detect_sum, scales=scales)
    M = wavelet_ops.multiresolution_support_jax(
        coeffs, sigma, K=3, epsilon=1e-1, max_iter=20, valid=scene_valid)
    plane = M[peak_scale].astype(detect_sum.dtype) * coeffs[peak_scale]
    H, W = plane.shape
    is_peak, lab = peak_mask_from_plane(plane, validb, min_area=min_area,
                                        return_labels=True)
    vals = jnp.where(is_peak, plane, -jnp.inf).ravel()

    if min_separation > 0:
        # cull over a candidate pool larger than the catalog so peaks
        # promoted by upstream culls are not lost at the top_k boundary
        pool = min(4 * max_peaks + 16, H * W)
        v, i = lax.top_k(vals, pool)
        kept = _cull_min_separation(i // W, i % W, jnp.take(lab.ravel(), i),
                                    v > 0, min_separation)
        # survivors first, brightness order preserved (stable sort)
        order = jnp.argsort(~kept, stable=True)[:max_peaks]
        active = jnp.take(kept, order)
        i = jnp.take(i, order)
        n_found = jnp.sum(kept).astype(jnp.int32)
    else:
        v, i = lax.top_k(vals, max_peaks)
        active = v > 0
        n_found = jnp.sum(is_peak).astype(jnp.int32)
    centers = jnp.stack([i // W, i % W], axis=-1).astype(jnp.int32)
    return centers, active, n_found


@partial(jax.jit,
         static_argnames=("max_peaks", "scales", "min_area", "peak_scale",
                          "min_separation"))
def detect_peaks_device(images, variance, scene_valid=None, *, max_peaks,
                        scales=3, min_area=4, peak_scale=1,
                        min_separation=0):
    """Batched on-device peak catalogs from raw pixel stacks.

    The device analog of the host pipeline ``get_detect_wavelets`` ->
    ``get_blend_structures`` -> ``get_peaks`` (ref detect.py:420-440,
    491-514, 517-572): significance-masked starlet coefficients of the
    band sum, 4-connected footprints of wavelet scale ``peak_scale``
    with the reference's ``min_area=4`` filter, strict 8-neighbor local
    maxima per footprint, brightest-first.

    Parameters
    ----------
    images, variance : (B, C, H, W) stacks (non-finite pixels must
        already be sanitized — ``stream_setup`` does this before
        calling).
    scene_valid : optional (B, H, W) mask of real pixels for
        zero-padded heterogeneous crops.
    max_peaks : static catalog slot count per blend.
    scales : starlet scale count (host default 3).
    peak_scale : which masked wavelet plane is segmented (the host's
        "2nd scale", index 1).
    min_separation : > 0 enables the reference's brightness-greedy
        per-footprint peak culling (detect_pybind11.cc:104-195; the
        host ``get_peaks`` flow uses 0).  ``n_found`` then counts
        surviving peaks within the 4*max_peaks+16 candidate pool.

    Returns
    -------
    centers : (B, max_peaks, 2) int32 (y, x), brightest-first.
    active : (B, max_peaks) bool — False rows are padding.
    n_found : (B,) int32 total peaks before the top-``max_peaks`` cut
        (n_found > max_peaks means the catalog overflowed).
    """
    images = jnp.asarray(images)
    variance = jnp.asarray(variance)
    B, _, H, W = images.shape
    if scene_valid is None:
        scene_valid = jnp.ones((B, H, W), images.dtype)
    else:
        scene_valid = jnp.asarray(scene_valid).astype(images.dtype)
    one = partial(_detect_peaks_one, max_peaks=int(max_peaks),
                  scales=int(scales), min_area=int(min_area),
                  peak_scale=int(peak_scale),
                  min_separation=float(min_separation))
    return jax.vmap(one)(images, variance, scene_valid)
