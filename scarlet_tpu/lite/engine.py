"""Compiled deblending engine: the whole proximal-Adam fit loop of a blend
as one jit-compiled ``lax.scan`` program.

This is the TPU-first reformulation of the reference's per-iteration Python
loop (scarlet/lite/models.py:589-624 + lite/parameters.py:274-305):

* components are grouped into **size buckets** (box sizes 21, 31, 41, ...;
  initialization.get_minimal_boxsize quantization): each bucket is a
  structure-of-arrays ``seds (Kb, C)`` / ``morphs (Kb, hb, wb)`` /
  ``origins (Kb, 2)``, so a single oversized source does not inflate the
  per-pixel work of every other component (monotonicity cost grows like
  hb^2 * depth(hb));
* the scene is assembled by scatter-adds into a zero-padded scene (padding
  by the largest box overhang gives exact clipped-overlap semantics without
  index clamping);
* PSF (difference-kernel) convolution uses precomputed kernel rFFTs,
  stored as stacked (re, im) float pairs (the axon TPU backend cannot
  transfer complex buffers host->device);
* gradients are the analytic lite gradients (convolve residual with the
  flipped kernel, then per-component einsum slices — lite/models.py:206-216,
  537-545);
* the adaprox (or FISTA) update + morphology prox chain (monotonicity,
  background thresholding, center floor, max-normalization —
  lite/models.py:218-244) runs batched per bucket; monotonicity uses the
  VMEM-resident Pallas kernel on accelerators;
* per-blend convergence (|dL| < e_rel |L|) freezes updates through an
  ``active`` mask, so a ``vmap`` over blends lets every blend in a batch
  stop independently while the batch keeps running.

The same step function serves the single-blend API (`LiteBlend.fit`) and the
batched multi-blend path (`scarlet_tpu.parallel`): batching is just a
leading axis plus `vmap`.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fft as fft_ops
from ..ops import prox as prox_ops
from ..ops.arrays import shift_zero
from ..optim import (AdaproxState, FistaState, init_adaprox_state,
                     adaprox_step, fista_step)

__all__ = [
    "LiteFitConfig",
    "BlendData",
    "BlendState",
    "make_scene",
    "render",
    "fit_step",
    "fit_scan",
    "make_blend_data",
    "make_blend_state",
    "monotonicity_tables",
    "pack_state",
    "unpack_state",
    "packed_morphs_ok",
]


@dataclass(frozen=True)
class LiteFitConfig:
    """Static (hashable) fit configuration; changing any field triggers a
    re-jit, so these are knobs, not data.

    Components live in per-size buckets: ``box_shapes[b]`` is the (odd)
    square box of bucket ``b`` holding ``bucket_counts[b]`` components,
    whose monotonicity projection needs ``mono_n_iters[b]`` Jacobi passes.
    """
    scene_shape: tuple            # (C, H, W)
    box_shapes: tuple             # ((hb, wb), ...) per bucket
    bucket_counts: tuple          # (Kb, ...) per bucket
    fft_shape: Optional[tuple]    # spatial FFT shape; None = no convolution
    mono_n_iters: tuple = ()      # per bucket; from monotonicity_tables
    optimizer: str = "adaprox"    # "adaprox" | "fista"
    scheme: str = "amsgrad"
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    p: float = 0.25
    max_prox_iter: int = 1
    floor: float = 1e-20
    bg_thresh: Optional[float] = 0.25
    morph_step: float = 1e-2
    sed_step_factor: float = 1e-2
    e_rel: float = 1e-4
    min_iter: int = 1
    fit_center_radius: int = 1
    min_gradient: float = 0.0
    # opt-in tolerance early-exit for the Pallas monotonicity kernel:
    # 0.0 (default) = the exact bitwise fixed point of the reference's
    # depth-N Jacobi DAG; > 0 exits once a 4-pass block moves no pixel
    # by more than mono_tol (morphs are unit-peak).  NOT reference
    # semantics — measure before use (BASELINE r4 A/B).
    mono_tol: float = 0.0
    # iteration-scheduled tolerance: run the mono kernel at the LOOSER
    # mono_tol_early while it < mono_tol_switch, then at mono_tol.  The
    # tolerance is a traced SMEM scalar (same compiled program), and
    # convergence freezing is suppressed until the switch so no blend can
    # freeze at early-tolerance quality (fit_step).  0/0 (default) = off.
    # Ignored by packed_prox_chain (static-tol kernel) and the XLA
    # fallback.  Measure before use (BASELINE r4).
    mono_tol_early: float = 0.0
    mono_tol_switch: int = 0
    # run the FULL monotonicity projection only every N-th iteration: on
    # skip iterations the traced tolerance is set huge, so the kernel
    # exits after its first 4-pass block (~4/depth of the work) while the
    # rest of the prox chain (threshold/floor/normalization) still runs.
    # Convergence freezing only fires on full-projection iterations, so
    # every frozen blend's final morph is exactly projected.  NOT
    # reference semantics (the reference projects every iteration, ref
    # lite/models.py:224-244).  MEASURED NEGATIVE (BASELINE r4): the
    # partially-projected flux of a skip iteration is clamped away by the
    # next full projection, so the fit zigzags — hsc_cosmos_35 trajectory
    # at N=2 reaches only -11,820 by iteration 100 vs -8,618.8 exact
    # (trajectory-level, backend-independent; a ~0.52x/iter cost cut
    # cannot buy back >2x the iterations).  Keep 1.
    mono_every: int = 1
    # in-program logical box growth (the reference's edge-pull test, ref
    # morphology.py:160-207, reformulated for static shapes): when the
    # next Adam update would pull flux onto a component's logical box
    # edge with mean magnitude > box_grow (0.1 in the reference, relative
    # to unit-peak morphs), the box_mask grows to the next quantized size
    # (half += 5) WITHIN the fixed physical bucket and that slot's
    # morphology step halves (ref morphology.py:186) — no recompile, no
    # host sync, moments stay (the reference's warm restart).  Requires
    # state.box_half/step_scale (stream_setup initializes them) and
    # data.box_masks.  None = off (static; default).
    box_grow: Optional[float] = None
    box_grow_step: int = 5        # half-size increment (10-px quantization)
    neighbor_weight: str = "angle"
    use_pallas: bool = False      # VMEM-resident monotonicity kernel (TPU)
    use_pallas_scene: bool = False  # VMEM scene assembly + grad gather (TPU)
    fuse_morph: bool = False      # fused adaprox+prox morphology kernel
    # persist morphologies + their optimizer moments in the mono kernel's
    # lane-packed (hb, K*wb) layout ACROSS iterations: the per-iteration
    # pack/unpack layout transposes cost ~25% of a fit step (xplane r3).
    # pack_state/unpack_state convert at fit-program entry/exit; scene and
    # gradient kernels read/write the packed blocks in place.  Requires
    # one bucket, both Pallas paths, adaprox, no band axis.
    packed_morphs: bool = False
    # run the whole packed morphology prox chain (mono + threshold +
    # center floor + normalization + slot gating) as ONE Pallas kernel
    # with the output aliased onto the carry buffer: without this, XLA
    # stores the packed while-loop carry batch-minor to please the
    # normalization's reshape/max fusion and transposes the whole stack
    # into and out of the mono kernel EVERY iteration (2 x 0.70 ms at
    # B=128 = 26% of the fit step, r4 xplane profile).  Only with
    # packed_morphs.
    packed_prox_chain: bool = False
    conv_mode: str = "fft"        # "fft" (XLA FFT) | "dft" (folded matmul-
    # DFT on the MXU — ~1.5x faster on TPU at the fit's small centered
    # shapes, exact to f32 roundoff; see ops/fft.dft_conv_matrices)
    conv_precision: str = "float32"  # matmul precision of the DFT conv
    # ("float32" = XLA HIGHEST, f32-equivalent — the bitwise-parity
    # anchor; "high" = 3-pass bf16, +1.9% at ~2e-5 relative logL drift;
    # "default" = 1-pass bf16, +4.2% but degraded — BASELINE r5 A/B)
    pallas_interpret: bool = False
    scene_pad: int = -1           # -1: one full (largest) box — always safe
    # band-axis model parallelism (shard_map): inside a shard_map over a
    # mesh axis of this name, scene_shape[0] is the LOCAL channel count and
    # cross-band reductions (logL, morph gradients, SED means, threshold
    # cuts) psum over the axis.  n_bands_total = global channel count.
    band_axis: Optional[str] = None
    n_bands_total: Optional[int] = None

    @property
    def n_buckets(self):
        return len(self.box_shapes)

    @property
    def pad(self):
        """Scene padding for exact clipped-overlap scatter-adds: must cover
        the largest out-of-scene box overhang."""
        if self.scene_pad >= 0:
            return self.scene_pad
        return max(max(s) for s in self.box_shapes)


class BlendData(NamedTuple):
    """Per-blend constants (batchable: add a leading axis + vmap).

    Bucketed fields are tuples with one array per bucket.
    """
    images: jnp.ndarray          # (C, H, W)
    weights: jnp.ndarray         # (C, H, W)
    kernel_rfft: Optional[jnp.ndarray]       # (2, C, fh, fw//2+1) re/im
    grad_kernel_rfft: Optional[jnp.ndarray]  # (2, C, ...) flipped kernel
    bg_rms: jnp.ndarray          # (C,) noise RMS per band
    sed_step_min: jnp.ndarray    # (C,) minimum SED step
    mono_weights: tuple          # per bucket: (ncand, 8, hb, wb)
    mono_keep: tuple             # per bucket: (ncand, hb, wb) float
    fista_step: Optional[tuple] = None  # per bucket: (Kb,) base FISTA steps
    box_masks: Optional[tuple] = None   # per bucket: (Kb, hb, wb) float —
    # 1 inside each component's logical box; confines morphologies to their
    # reference box when the physical bucket is larger
    scene_mask: Optional[jnp.ndarray] = None  # (H, W) float — 1 on real
    # scene pixels.  For blends zero-padded to a larger shared layout this
    # clips model flux at the TRUE scene edge before convolution (matching
    # each blend's natural-layout fit exactly); None = whole scene real


class BlendState(NamedTuple):
    """Per-blend mutable fit state; bucketed fields are tuples."""
    seds: tuple                  # per bucket: (Kb, C)
    morphs: tuple                # per bucket: (Kb, hb, wb)
    origins: tuple               # per bucket: (Kb, 2) int32 scene coords
    comp_active: tuple           # per bucket: (Kb,) bool (False = null slot)
    sed_opt: tuple               # per bucket: AdaproxState | FistaState
    morph_opt: tuple             # per bucket: AdaproxState | FistaState
    active: jnp.ndarray          # () bool — blend still iterating
    it: jnp.ndarray              # () int32 — iterations executed
    last_loss: jnp.ndarray       # () float — previous logL
    # config.box_grow state (None when growth is off): per bucket
    box_half: Optional[tuple] = None    # (Kb,) int32 — grown logical
    # half-size; -1 = still at the init box (data.box_masks alone)
    step_scale: Optional[tuple] = None  # (Kb,) float — morph step
    # multiplier, halved on each growth (ref morphology.py:186)


# ---------------------------------------------------------------------------
# Setup helpers (host-side)
# ---------------------------------------------------------------------------
def monotonicity_tables(box_shape, fit_center_radius=1,
                        neighbor_weight="angle"):
    """Stacked monotonicity weight tables for every candidate center in the
    (2r+1)^2 peak-search window around the box center.

    Returns (weights (ncand, 8, hb, wb), keep (ncand, hb, wb), n_iter).
    Memoized (host numpy) — batching many blends with a shared box layout
    rebuilds identical tables otherwise.
    """
    from ..cache import Cache

    key = (tuple(box_shape), int(fit_center_radius), neighbor_weight)
    try:
        return Cache.check("monotonicity_tables", key)
    except KeyError:
        pass
    Hb, Wb = box_shape
    bc = (Hb // 2, Wb // 2)
    r = int(fit_center_radius)
    centers = [
        (bc[0] + dy, bc[1] + dx)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    ] if r > 0 else [bc]

    weights, keeps, n_iter = [], [], 0
    for c in centers:
        w = prox_ops.monotonic_weights(box_shape, neighbor_weight, c)
        weights.append(w)
        keep = np.zeros(box_shape, np.float32)
        keep[c] = 1.0
        keeps.append(keep)
        n_iter = max(n_iter, prox_ops.monotonic_depth(w, box_shape, c))
    out = (np.stack(weights), np.stack(keeps), n_iter)
    Cache.set("monotonicity_tables", key, out)
    return out


def make_blend_data(images, weights, diff_kernel, bg_rms, config,
                    sed_step_min=None):
    """Build the BlendData pytree: precompute kernel rFFTs and per-bucket
    monotonicity tables."""
    images = jnp.asarray(images)
    weights = jnp.asarray(weights)
    if diff_kernel is not None:
        diff_kernel = jnp.asarray(diff_kernel)
        kernel_rfft = _split_complex(
            fft_ops.transform(diff_kernel, config.fft_shape, (-2, -1)))
        grad_kernel_rfft = _split_complex(fft_ops.transform(
            diff_kernel[..., ::-1, ::-1], config.fft_shape, (-2, -1)))
    else:
        kernel_rfft = grad_kernel_rfft = None

    dtype = np.dtype(images.dtype)
    mono_w, mono_keep = [], []
    for shape in config.box_shapes:
        w, keep, _ = monotonicity_tables(
            shape, config.fit_center_radius, config.neighbor_weight)
        mono_w.append(jnp.asarray(w.astype(dtype)))
        mono_keep.append(jnp.asarray(keep.astype(dtype)))

    bg_rms = jnp.asarray(bg_rms)
    if sed_step_min is None:
        sed_step_min = bg_rms / 10.0
    return BlendData(
        images=images,
        weights=weights,
        kernel_rfft=kernel_rfft,
        grad_kernel_rfft=grad_kernel_rfft,
        bg_rms=bg_rms,
        sed_step_min=jnp.asarray(sed_step_min),
        mono_weights=tuple(mono_w),
        mono_keep=tuple(mono_keep),
    )


def make_blend_state(seds, morphs, origins, comp_active=None,
                     sed_opt=None, morph_opt=None):
    """Assemble a BlendState from per-bucket lists of arrays (or single
    arrays for one bucket)."""
    def as_buckets(x):
        if isinstance(x, (list, tuple)):
            return tuple(x)
        return (x,)

    seds = tuple(jnp.asarray(s) for s in as_buckets(seds))
    morphs = tuple(jnp.asarray(m) for m in as_buckets(morphs))
    origins = tuple(jnp.asarray(o, jnp.int32) for o in as_buckets(origins))
    if comp_active is None:
        comp_active = tuple(jnp.ones((s.shape[0],), bool) for s in seds)
    else:
        comp_active = tuple(jnp.asarray(a) for a in as_buckets(comp_active))
    if sed_opt is None:
        sed_opt = tuple(init_adaprox_state(s) for s in seds)
    else:
        sed_opt = as_buckets(sed_opt)
    if morph_opt is None:
        morph_opt = tuple(init_adaprox_state(m) for m in morphs)
    else:
        morph_opt = as_buckets(morph_opt)
    return BlendState(
        seds=seds,
        morphs=morphs,
        origins=origins,
        comp_active=comp_active,
        sed_opt=sed_opt,
        morph_opt=morph_opt,
        active=jnp.asarray(True),
        it=jnp.asarray(0, jnp.int32),
        last_loss=jnp.asarray(jnp.inf),
    )


# ---------------------------------------------------------------------------
# Packed morphology layout (persistent lane packing across iterations)
# ---------------------------------------------------------------------------
def packed_morphs_ok(config):
    """Whether the persistent packed-morphology layout applies."""
    if not (config.packed_morphs and config.n_buckets == 1
            and config.use_pallas and config.use_pallas_scene
            and config.optimizer == "adaprox"
            and config.band_axis is None):
        return False
    hb, wb = config.box_shapes[0]
    return config.bucket_counts[0] * wb <= 4096


def _pack_morph(x, hb, wb):
    """(..., K, hb, wb) -> lane-packed (..., hb, K*wb)."""
    K = x.shape[-3]
    return jnp.swapaxes(x, -3, -2).reshape(*x.shape[:-3], hb, K * wb)


def _unpack_morph(x, K, hb, wb):
    """(..., hb, K*wb) -> (..., K, hb, wb)."""
    v = x.reshape(*x.shape[:-2], hb, K, wb)
    return jnp.swapaxes(v, -3, -2)


def pack_state(state, config):
    """Convert a BlendState's morphs + morph moments to the packed layout
    (no-op unless :func:`packed_morphs_ok`); inverse: :func:`unpack_state`.
    Works on single and batched (leading-axis) states."""
    if not packed_morphs_ok(config):
        return state
    hb, wb = config.box_shapes[0]
    conv = lambda m: _pack_morph(m, hb, wb)  # noqa: E731
    return state._replace(
        morphs=(conv(state.morphs[0]),),
        morph_opt=(jax.tree.map(conv, state.morph_opt[0]),),
    )


def unpack_state(state, config):
    if not packed_morphs_ok(config):
        return state
    hb, wb = config.box_shapes[0]
    K = config.bucket_counts[0]
    conv = lambda m: _unpack_morph(m, K, hb, wb)  # noqa: E731
    return state._replace(
        morphs=(conv(state.morphs[0]),),
        morph_opt=(jax.tree.map(conv, state.morph_opt[0]),),
    )


# ---------------------------------------------------------------------------
# Forward model
# ---------------------------------------------------------------------------
def make_scene(state, config):
    """Scatter-add all buckets' factorized components into the scene.

    Works in a scene padded by the largest box overhang so partially
    out-of-scene boxes clip exactly (dynamic_update_slice would otherwise
    clamp and shift).
    """
    C, H, W = config.scene_shape
    P = config.pad
    dtype = state.morphs[0].dtype

    if config.use_pallas_scene:
        from ..ops.pallas_kernels import scene_assembly

        # layout detection by rank: packed morphs have one axis fewer than
        # (K, hb, wb) — external callers (records/render) hold unpacked
        # states even under a packed config
        packed = (packed_morphs_ok(config)
                  and state.morphs[0].ndim == state.seds[0].ndim)
        scene = None
        for b in range(config.n_buckets):
            part = scene_assembly(
                state.seds[b], state.morphs[b], state.origins[b],
                state.comp_active[b], config.scene_shape, P,
                interpret=config.pallas_interpret,
                box_shape=config.box_shapes[b] if packed else None)
            scene = part if scene is None else scene + part
        return scene

    scene = jnp.zeros((C, H + 2 * P, W + 2 * P), dtype=dtype)
    zero = jnp.asarray(0, jnp.int32)

    for b, (hb, wb) in enumerate(config.box_shapes):
        seds = state.seds[b]
        morphs = state.morphs[b]
        origins = state.origins[b]
        on = state.comp_active[b]
        # unrolled over the (small, static) component count: XLA updates
        # the scene windows in place without scan carry copies
        for k in range(seds.shape[0]):
            model = (seds[k][:, None, None] * morphs[k][None]) * on[k]
            oy = origins[k, 0] + P
            ox = origins[k, 1] + P
            cur = jax.lax.dynamic_slice(scene, (zero, oy, ox), (C, hb, wb))
            scene = jax.lax.dynamic_update_slice(scene, cur + model,
                                                 (zero, oy, ox))
    return scene[:, P:P + H, P:P + W]


def _band_sum(x, config):
    """Sum a locally-reduced value over the band mesh axis (identity when
    band parallelism is off)."""
    if config.band_axis is not None:
        return jax.lax.psum(x, config.band_axis)
    return x


def _split_complex(k):
    """Complex array -> stacked (2, ...) float re/im."""
    return jnp.stack([jnp.real(k), jnp.imag(k)])


def _join_complex(k):
    """Stacked (2, ...) float re/im -> complex."""
    return jax.lax.complex(k[0], k[1])


def _convolve(scene, kernel_rfft, config):
    if kernel_rfft is None:
        return scene
    if config.conv_mode == "dft":
        mats = fft_ops.dft_conv_matrices(
            scene.shape[-2:], config.fft_shape, scene.dtype)
        return fft_ops.convolve_dft(scene, _join_complex(kernel_rfft), mats,
                                    precision=config.conv_precision)
    return fft_ops.convolve_fft(scene, _join_complex(kernel_rfft),
                                config.fft_shape, (-2, -1))


def render(state, data, config):
    """Scene model convolved to the observed PSF."""
    scene = make_scene(state, config)
    if data.scene_mask is not None:
        scene = scene * data.scene_mask
    return _convolve(scene, data.kernel_rfft, config)


# ---------------------------------------------------------------------------
# In-program logical box growth (config.box_grow)
# ---------------------------------------------------------------------------
def _grow_enabled(config, state):
    return (config.box_grow is not None and state.box_half is not None
            and config.optimizer == "adaprox")


def _base_half(base_mask, bc):
    """Per-slot logical half-size of the INIT box mask: the largest
    |offset| from the box center with mask support (K,) int32.
    Loop-invariant in the scan (base_mask is BlendData)."""
    K, hb, wb = base_mask.shape
    on = base_mask > 0.5
    dy = jnp.abs(jnp.arange(hb) - bc[0])
    dx = jnp.abs(jnp.arange(wb) - bc[1])
    ry = jnp.max(jnp.where(jnp.any(on, 2), dy[None], 0), axis=1)
    rx = jnp.max(jnp.where(jnp.any(on, 1), dx[None], 0), axis=1)
    return jnp.maximum(ry, rx).astype(jnp.int32)


def _grown_mask_stack(base_mask, box_half, bc):
    """Effective logical mask: the init mask grown to the centered square
    of half-size ``box_half`` (-1 = no growth, init mask alone)."""
    K, hb, wb = base_mask.shape
    dy = jnp.abs(jnp.arange(hb) - bc[0])[None, :, None]
    dx = jnp.abs(jnp.arange(wb) - bc[1])[None, None, :]
    h = box_half[:, None, None]
    inside = (dy <= h) & (dx <= h)
    return jnp.maximum(base_mask, inside.astype(base_mask.dtype))


def _grown_mask_packed(base_packed, box_half, bc, wb):
    """:func:`_grown_mask_stack` on the lane-packed (hb, K*wb) layout."""
    hb, gW = base_packed.shape
    dy = jnp.abs(jnp.arange(hb) - bc[0])[:, None]
    dx = jnp.abs(jnp.arange(gW) % wb - bc[1])[None, :]
    h = jnp.repeat(box_half, wb)[None, :]
    inside = (dy <= h) & (dx <= h)
    return jnp.maximum(base_packed, inside.astype(base_packed.dtype))


def _edge_pull_view(view, m_view, v_view, step_k, h_eff, bc):
    """The reference's box-grow test (ref morphology.py:163-177) on the
    (hb, K, wb) slot view: the magnitude of the NEXT Adam update
    ``-m / v^(1/4) * step`` where the model has flux, averaged over each
    of the 4 edges of the current logical box; returns the per-slot max
    edge mean (K,).  Deviation from the reference: pixels with v == 0
    contribute 0 to the mean instead of being excluded (their m is 0
    too), which is conservative."""
    hb, K, wb = view.shape
    dtype = view.dtype
    dy = (jnp.arange(hb) - bc[0])[:, None, None]       # (hb,1,1)
    dx = (jnp.arange(wb) - bc[1])[None, None, :]       # (1,1,wb)
    h = h_eff[None, :, None]                           # (1,K,1)
    denom = jnp.sqrt(jnp.sqrt(jnp.maximum(v_view, 0.0)))
    gu = jnp.where(v_view > 0, -m_view / jnp.maximum(denom, 1e-30), 0.0)
    pull = gu * step_k[None, :, None] * (view > 0)
    in_y = jnp.abs(dy) <= h
    in_x = jnp.abs(dx) <= h
    best = None
    for mask in ((dy == -h) & in_x, (dy == h) & in_x,
                 (dx == -h) & in_y, (dx == h) & in_y):
        mf = mask.astype(dtype)
        s = jnp.sum(pull * mf, axis=(0, 2))
        n = jnp.maximum(jnp.sum(mf, axis=(0, 2)), 1.0)
        e = s / n
        best = e if best is None else jnp.maximum(best, e)
    return best


def _grow_update(config, b, mb_view, m_view, v_view, base_h, box_half,
                 step_scale, gate):
    """Evaluate the edge-pull trigger and return (new_box_half,
    new_step_scale) for one bucket; all inputs in (hb, K, wb) view
    layout.  Growth stays inside the physical bucket."""
    hb, wb = config.box_shapes[b]
    bc = (hb // 2, wb // 2)
    h_eff = jnp.maximum(base_h, box_half)
    step_k = (config.morph_step * step_scale).astype(mb_view.dtype)
    pull = _edge_pull_view(mb_view, m_view, v_view, step_k, h_eff, bc)
    can = (h_eff + config.box_grow_step) <= min(bc)
    trig = (pull > config.box_grow) & can & gate
    new_half = jnp.where(trig, h_eff + config.box_grow_step, box_half)
    new_scale = jnp.where(trig, step_scale * 0.5, step_scale)
    return new_half, new_scale


def _mono_tol_arr(config, it):
    """Traced tolerance for the scheduled mono exit (None = static
    ``config.mono_tol`` alone).  Per blend: the looser ``mono_tol_early``
    before iteration ``mono_tol_switch``, ``mono_tol`` after; with
    ``mono_every > 1``, skip iterations (``it % mono_every != 0``) get a
    huge tolerance so the kernel exits after one pass block."""
    tol = None
    if (config.mono_tol_switch > 0
            and config.mono_tol_early > config.mono_tol
            and it is not None):
        tol = jnp.where(it < config.mono_tol_switch,
                        config.mono_tol_early, config.mono_tol)
    if config.mono_every > 1 and it is not None:
        base = config.mono_tol if tol is None else tol
        # morphs are unit-peak, so 1e6 exceeds any possible |delta|
        tol = jnp.where(it % config.mono_every == 0, base, 1e6)
    return tol


# ---------------------------------------------------------------------------
# Morphology prox chain (batched over one bucket's components)
# ---------------------------------------------------------------------------
def _prox_morph_bucket(morphs, seds, data, config, b, box_half=None,
                       it=None):
    """Monotonicity -> background threshold (or positivity) -> center floor
    -> max normalization, over bucket ``b``'s (Kb, hb, wb) stack.

    Ref: lite/models.py:224-244.  The monotonicity projection runs either as
    the VMEM-resident Pallas kernel (TPU) or as fused XLA Jacobi passes.
    """
    K = morphs.shape[0]
    hb, wb = config.box_shapes[b]
    bc = (hb // 2, wb // 2)
    r = config.fit_center_radius
    n_iter = config.mono_n_iters[b]

    if data.box_masks is not None:
        # confine each morphology to its logical (reference) box — gradient
        # steps can push flux into the physical bucket's padding; with
        # config.box_grow the logical box is the init mask grown to the
        # state's per-slot half-size
        mask = data.box_masks[b]
        if box_half is not None:
            mask = _grown_mask_stack(mask, box_half, (hb // 2, wb // 2))
        morphs = morphs * mask

    # select the monotonicity table for the brightest pixel near each center
    if r > 0:
        windows = morphs[:, bc[0] - r:bc[0] + r + 1,
                         bc[1] - r:bc[1] + r + 1].reshape(K, -1)
        idx = jnp.argmax(windows, axis=1).astype(jnp.int32)
    else:
        idx = jnp.zeros((K,), jnp.int32)

    if config.use_pallas:
        from ..ops.pallas_kernels import batched_monotonic_prox

        morphs = batched_monotonic_prox(
            morphs, idx, data.mono_weights[b], data.mono_keep[b],
            n_iter, config.min_gradient,
            interpret=config.pallas_interpret, tol=config.mono_tol,
            tol_arr=_mono_tol_arr(config, it))
    else:
        w = data.mono_weights[b][idx]       # (Kb, 8, hb, wb)
        keep = data.mono_keep[b][idx] > 0.5
        scale = 1.0 - config.min_gradient
        X0 = morphs

        def body(_, x):
            ref = jnp.zeros_like(x)
            for d, (dy, dx) in enumerate(prox_ops.NEIGHBOR_OFFSETS):
                ref = ref + w[:, d] * shift_zero(x, dy, dx)
            return jnp.where(keep, X0, jnp.minimum(X0, ref * scale))

        morphs = jax.lax.fori_loop(0, n_iter, body, X0)

    if config.bg_thresh is not None:
        model = seds[:, :, None, None] * morphs[:, None]
        above = jnp.sum(
            model >= (config.bg_thresh * data.bg_rms)[None, :, None, None],
            axis=1)
        cut = _band_sum(above, config) == 0
        morphs = jnp.where(cut, 0.0, morphs)
    else:
        morphs = jnp.maximum(morphs, 0.0)

    center_val = jnp.maximum(morphs[:, bc[0], bc[1]], config.floor)
    morphs = morphs.at[:, bc[0], bc[1]].set(center_val)
    return morphs / jnp.max(morphs, axis=(-2, -1), keepdims=True)


def _prox_morph_bucket_packed(packed, seds, data, config, b,
                              box_half=None, it=None):
    """:func:`_prox_morph_bucket` on the persistent lane-packed
    (hb, K*wb) layout.  The (hb, K, wb) view is a free reshape (the lane
    split is row-major), so every XLA piece of the chain — threshold,
    center floor, per-slot normalization — runs without layout copies;
    only the monotonicity kernel touches the raw packed array.

    The background-threshold cut is expressed per slot as the pixel
    cutoff ``min_c t_c / sed_kc`` (mathematically the reference's
    any-band ``sed_c * x >= t_c`` count, ref lite/models.py:224-244)."""
    K = seds.shape[0]
    hb, wb = config.box_shapes[b]
    bc = (hb // 2, wb // 2)
    r = config.fit_center_radius
    n_iter = config.mono_n_iters[b]

    if data.box_masks is not None:
        # loop-invariant pack: XLA hoists it out of the scan
        mask = _pack_morph(data.box_masks[b], hb, wb)
        if box_half is not None:
            mask = _grown_mask_packed(mask, box_half, bc, wb)
        packed = packed * mask

    # candidate-center selection: slice the 3 center rows FIRST so the
    # (hb, K, wb) view reshape only ever touches a tiny array — a view
    # reshape of the full packed stack here (and in the prox chain
    # below) makes XLA store the while-loop CARRY batch-minor and
    # TRANSPOSE the whole (B, hb, K*wb) stack into and out of the mono
    # kernel every iteration (2 x 0.70 ms at B=128 = 26% of the fit
    # step, r4 xplane profile)
    if r > 0:
        rows3 = packed[bc[0] - r:bc[0] + r + 1, :]
        win = rows3.reshape(2 * r + 1, K, wb)[:, :,
                                              bc[1] - r:bc[1] + r + 1]
        w2 = jnp.moveaxis(win, 1, 0).reshape(K, -1)   # (K, (2r+1)^2)
        idx = jnp.argmax(w2, axis=1).astype(jnp.int32)
    else:
        idx = jnp.zeros((K,), jnp.int32)

    from ..ops.pallas_kernels import monotonic_prox_packed

    packed = monotonic_prox_packed(
        packed, idx, data.mono_weights[b], data.mono_keep[b], wb, n_iter,
        config.min_gradient, interpret=config.pallas_interpret,
        tol=config.mono_tol, tol_arr=_mono_tol_arr(config, it))

    # threshold / positivity, center floor, per-slot max normalization —
    # expressed on the 2D packed array with iota masks, per-slot rows,
    # and a row-then-slot max (bitwise identical to the (hb, K, wb) view
    # formulation, but layout-neutral: see the comment above)
    colm = jnp.arange(K * wb)
    if config.bg_thresh is not None:
        t_c = config.bg_thresh * data.bg_rms
        thr = jnp.min(t_c[None, :] / jnp.maximum(seds, config.floor),
                      axis=1)
        packed = jnp.where(packed < jnp.repeat(thr, wb)[None, :], 0.0,
                           packed)
    else:
        packed = jnp.maximum(packed, 0.0)
    center_mask = ((jnp.arange(hb)[:, None] == bc[0])
                   & (colm[None, :] % wb == bc[1]))
    packed = jnp.where(center_mask,
                       jnp.maximum(packed, config.floor), packed)
    rowmax = jnp.max(packed, axis=0)                     # (K*wb,)
    slotmax = jnp.max(rowmax.reshape(K, wb), axis=-1)    # (K,)
    return packed / jnp.repeat(slotmax, wb)[None, :]


# ---------------------------------------------------------------------------
# One fit iteration
# ---------------------------------------------------------------------------
def fit_step(state, data, config):
    """One adaprox/FISTA iteration over all components of one blend.

    Returns (new_state, logL) with logL = -0.5 sum(w (model - img)^2)
    (the value the reference records in ``LiteBlend.loss``,
    lite/models.py:541).
    """
    C, H, W = config.scene_shape
    P = config.pad

    scene = make_scene(state, config)
    if data.scene_mask is not None:
        # model flux clips at the TRUE scene edge (zero-padded layouts)
        scene = scene * data.scene_mask
    model = _convolve(scene, data.kernel_rfft, config)
    residual = data.weights * (model - data.images)
    logL = _band_sum(-0.5 * jnp.sum(residual * (model - data.images)),
                     config)

    grad_scene = _convolve(residual, data.grad_kernel_rfft, config)
    if data.scene_mask is not None:
        grad_scene = grad_scene * data.scene_mask
    gpad = jnp.pad(grad_scene, ((0, 0), (P, P), (P, P)))

    zero = jnp.asarray(0, jnp.int32)
    it = state.it
    active = state.active

    new_seds, new_sed_opts = [], []
    new_morphs, new_morph_opts = [], []
    grow = _grow_enabled(config, state) and data.box_masks is not None
    new_halves, new_scales = [], []

    packed = (packed_morphs_ok(config)
              and state.morphs[0].ndim == state.seds[0].ndim)

    for b, (hb, wb) in enumerate(config.box_shapes):
        seds_b = state.seds[b]
        morphs_b = state.morphs[b]
        on_b = state.comp_active[b]

        if config.use_pallas_scene:
            from ..ops.pallas_kernels import grad_gather

            g_seds, g_morphs = grad_gather(
                gpad, seds_b, morphs_b, state.origins[b], P,
                interpret=config.pallas_interpret,
                box_shape=(hb, wb) if packed else None)
            g_morphs = _band_sum(g_morphs, config)
        else:
            def grads(origin, sed, morph):
                g = jax.lax.dynamic_slice(
                    gpad, (zero, origin[0] + P, origin[1] + P), (C, hb, wb))
                g_sed = jnp.einsum("chw,hw->c", g, morph)
                g_morph = _band_sum(jnp.einsum("c,chw->hw", sed, g), config)
                return g_sed, g_morph

            g_seds, g_morphs = jax.vmap(grads)(
                state.origins[b], seds_b, morphs_b)

        if config.optimizer == "fista":
            # FISTA steps scale by the squared norm of the other factor
            # (lite/parameters.py:133-146)
            def update_sed(sed, g, opt, base, morph):
                step = base / jnp.maximum(jnp.sum(morph * morph), 1e-12)
                # morph is band-replicated: no psum
                return fista_step(
                    sed, g, it, opt, step,
                    prox=lambda x, s: jnp.maximum(x, config.floor))

            sb, sopt = jax.vmap(update_sed)(
                seds_b, g_seds, state.sed_opt[b], data.fista_step[b],
                morphs_b)

            # gradient-extrapolation y = z - step*g; the batched prox chain
            # produces x_{k+1}; the t/z acceleration update follows
            # (Beck & Teboulle ordering, lite/parameters.py:133-146)
            def morph_y(g, opt, base, sed):
                step = base / jnp.maximum(
                    _band_sum(jnp.sum(sed * sed), config), 1e-12)
                return opt.z - step * g

            stepped = jax.vmap(morph_y)(
                g_morphs, state.morph_opt[b], data.fista_step[b], seds_b)
        else:
            # SED: relative step with a noise-floor minimum
            # (lite/initialization.py:275-279)
            n_bands = config.n_bands_total or config.scene_shape[0]

            def update_sed(sed, g, opt, on):
                step = jnp.maximum(
                    data.sed_step_min,
                    config.sed_step_factor
                    * _band_sum(jnp.sum(sed), config) / n_bands)
                return adaprox_step(
                    sed, g, it, opt, step,
                    prox=lambda x, s: jnp.maximum(x, config.floor),
                    scheme=config.scheme, b1=config.b1, b2=config.b2,
                    eps=config.eps, p=config.p,
                    max_prox_iter=config.max_prox_iter,
                    active=active & on,
                )

            sb, sopt = jax.vmap(update_sed)(
                seds_b, g_seds, state.sed_opt[b], on_b)

            if packed:
                # persistent packed layout: elementwise adaprox step on
                # the packed arrays, then the packed prox chain; moments
                # never leave the packed layout
                K = on_b.shape[0]
                if grow:
                    # per-slot morph step, halved on each box growth
                    mstep = config.morph_step * jnp.repeat(
                        state.step_scale[b], wb)        # (K*wb,)
                else:
                    mstep = config.morph_step
                stepped, mopt = adaprox_step(
                    morphs_b, g_morphs, it, state.morph_opt[b],
                    mstep, prox=None, scheme=config.scheme,
                    b1=config.b1, b2=config.b2, eps=config.eps,
                    p=config.p, max_prox_iter=config.max_prox_iter)
                gate = active & on_b                     # (K,)
                if config.packed_prox_chain:
                    # whole prox chain + gating in one aliased kernel
                    # (no XLA op touches the packed stack: the carry
                    # keeps the kernel's layout, killing the
                    # per-iteration transposes)
                    from ..ops.pallas_kernels import (
                        monotonic_prox_packed_chain)

                    if data.box_masks is not None:
                        mask = _pack_morph(data.box_masks[b], hb, wb)
                        if grow:
                            mask = _grown_mask_packed(
                                mask, state.box_half[b],
                                (hb // 2, wb // 2), wb)
                        stepped = stepped * mask
                    view = stepped.reshape(hb, K, wb)
                    r = config.fit_center_radius
                    bc = (hb // 2, wb // 2)
                    if r > 0:
                        win = view[bc[0] - r:bc[0] + r + 1, :,
                                   bc[1] - r:bc[1] + r + 1]
                        w2 = jnp.moveaxis(win, 1, 0).reshape(K, -1)
                        idx = jnp.argmax(w2, axis=1).astype(jnp.int32)
                    else:
                        idx = jnp.zeros((K,), jnp.int32)
                    if config.bg_thresh is None:
                        thr = jnp.zeros((K,), stepped.dtype)
                    else:
                        t_c = config.bg_thresh * data.bg_rms
                        thr = jnp.min(
                            t_c[None, :] / jnp.maximum(sb, config.floor),
                            axis=1)
                    thr_row = jnp.repeat(thr.astype(stepped.dtype), wb)
                    gate_row = jnp.repeat(gate.astype(stepped.dtype), wb)
                    mb = monotonic_prox_packed_chain(
                        morphs_b, stepped, idx, data.mono_weights[b],
                        data.mono_keep[b], thr_row, gate_row, wb,
                        config.mono_n_iters[b], config.min_gradient,
                        config.floor, interpret=config.pallas_interpret,
                        tol=config.mono_tol)
                    # moment gating stays elementwise (no reshape: a
                    # reshape/select fusion would re-impose the
                    # batch-minor layout this path exists to avoid)
                    gate_el = gate_row > 0.5
                    mopt = jax.tree.map(
                        lambda new, old: jnp.where(gate_el[None, :],
                                                   new, old),
                        mopt, state.morph_opt[b])
                else:
                    proxed = _prox_morph_bucket_packed(
                        stepped, sb, data, config, b,
                        box_half=state.box_half[b] if grow else None,
                        it=it)

                    # per-slot gating as an elementwise row select (a
                    # reshape/select fusion here would re-impose the
                    # batch-minor carry layout — see
                    # _prox_morph_bucket_packed)
                    gate_row = jnp.repeat(gate, wb)       # (K*wb,) bool
                    mb = jnp.where(gate_row[None, :], proxed, morphs_b)
                    mopt = jax.tree.map(
                        lambda new, old: jnp.where(gate_row[None, :],
                                                   new, old),
                        mopt, state.morph_opt[b])
                if grow:
                    base_h = _base_half(data.box_masks[b], (hb // 2,
                                                            wb // 2))
                    nh, ns = _grow_update(
                        config, b, mb.reshape(hb, K, wb),
                        mopt.m.reshape(hb, K, wb),
                        mopt.v.reshape(hb, K, wb), base_h,
                        state.box_half[b], state.step_scale[b], gate)
                    new_halves.append(nh)
                    new_scales.append(ns)
                new_seds.append(sb)
                new_sed_opts.append(sopt)
                new_morphs.append(mb)
                new_morph_opts.append(mopt)
                continue

            if (config.use_pallas and config.fuse_morph
                    and config.scheme == "amsgrad"
                    and config.max_prox_iter <= 1
                    and config.band_axis is None
                    and not grow):
                # fused VMEM pass: amsgrad moments + damped step + the
                # whole morphology prox chain in one kernel (the
                # background-threshold cut expressed as the per-slot
                # pixel cutoff min_c t_c/sed_c; 0 == positivity clamp)
                from ..ops.pallas_kernels import fused_morph_update

                if config.bg_thresh is None:
                    thr = jnp.zeros((sb.shape[0],), morphs_b.dtype)
                else:
                    t_c = config.bg_thresh * data.bg_rms
                    thr = jnp.min(
                        t_c[None, :] / jnp.maximum(sb, config.floor),
                        axis=1)
                damp_step = jnp.where(it > 0, 1.0, 0.1) * config.morph_step
                if data.box_masks is not None:
                    bmasks = data.box_masks[b]
                else:
                    bmasks = jnp.ones_like(morphs_b)
                mb, mopt = fused_morph_update(
                    morphs_b, g_morphs, state.morph_opt[b], active & on_b,
                    data.mono_weights[b], data.mono_keep[b], bmasks,
                    thr, damp_step, config.mono_n_iters[b],
                    config.min_gradient, config.fit_center_radius,
                    config.b1, config.b2, config.eps, config.floor,
                    interpret=config.pallas_interpret)
                new_seds.append(sb)
                new_sed_opts.append(sopt)
                new_morphs.append(mb)
                new_morph_opts.append(mopt)
                continue

            # morphology: constant step (times the per-slot box-grow
            # halving when growth is on); prox chain applied with the
            # *new* SED (lite/models.py:246-252), batched over the bucket
            def update_morph(morph, g, opt, mstep):
                return adaprox_step(
                    morph, g, it, opt, mstep, prox=None,
                    scheme=config.scheme, b1=config.b1, b2=config.b2,
                    eps=config.eps, p=config.p,
                    max_prox_iter=config.max_prox_iter,
                )

            msteps = (config.morph_step * state.step_scale[b] if grow
                      else jnp.full((on_b.shape[0],), config.morph_step,
                                    morphs_b.dtype))
            stepped, mopt = jax.vmap(update_morph)(
                morphs_b, g_morphs, state.morph_opt[b], msteps)

        if config.optimizer == "fista":
            gate_sed = (active & on_b)[:, None]
            sb = jnp.where(gate_sed, sb, seds_b)
            sopt = jax.tree.map(
                lambda new, old: jnp.where(
                    gate_sed if new.ndim == 2 else (active & on_b), new, old),
                sopt, state.sed_opt[b])

        proxed = _prox_morph_bucket(
            stepped, sb, data, config, b,
            box_half=state.box_half[b] if grow else None, it=it)

        if config.optimizer == "fista":
            def morph_accel(x_old, x_new, opt):
                t_new = 0.5 * (1 + jnp.sqrt(1 + 4 * opt.t ** 2))
                omega = 1 + (opt.t - 1) / t_new
                return FistaState(z=x_old + omega * (x_new - x_old), t=t_new)

            mopt = jax.vmap(morph_accel)(morphs_b, proxed,
                                         state.morph_opt[b])

        gate = (active & on_b)[:, None, None]
        mb = jnp.where(gate, proxed, morphs_b)
        mopt = jax.tree.map(
            lambda new, old: jnp.where(
                gate if new.ndim == 3 else (active & on_b), new, old),
            mopt, state.morph_opt[b],
        )

        if grow:
            base_h = _base_half(data.box_masks[b], (hb // 2, wb // 2))
            nh, ns = _grow_update(
                config, b, jnp.moveaxis(mb, 0, 1),
                jnp.moveaxis(mopt.m, 0, 1), jnp.moveaxis(mopt.v, 0, 1),
                base_h, state.box_half[b], state.step_scale[b],
                active & on_b)
            new_halves.append(nh)
            new_scales.append(ns)

        new_seds.append(sb)
        new_sed_opts.append(sopt)
        new_morphs.append(mb)
        new_morph_opts.append(mopt)

    # convergence: |dL| < e_rel |L| after min_iter (lite/models.py:618).
    # With the iteration-scheduled mono tolerance, freezing is suppressed
    # until the switch: no blend may converge at early-tolerance quality.
    min_it = config.min_iter
    if config.mono_tol_switch > 0 and config.mono_tol_early > config.mono_tol:
        min_it = max(min_it, config.mono_tol_switch)
    converged = (it > min_it) & (
        jnp.abs(logL - state.last_loss) < config.e_rel * jnp.abs(logL)
    )
    if config.mono_every > 1:
        # only freeze on full-projection iterations: a blend must never
        # stop with a skip iteration's loosely-projected morph
        converged = converged & (it % config.mono_every == 0)
    new_active = active & ~converged

    new_state = BlendState(
        seds=tuple(new_seds),
        morphs=tuple(new_morphs),
        origins=state.origins,
        comp_active=state.comp_active,
        sed_opt=tuple(new_sed_opts),
        morph_opt=tuple(new_morph_opts),
        active=new_active,
        it=state.it + active.astype(jnp.int32),
        last_loss=jnp.where(active, logL, state.last_loss),
        box_half=tuple(new_halves) if grow else state.box_half,
        step_scale=tuple(new_scales) if grow else state.step_scale,
    )
    return new_state, logL


@partial(jax.jit, static_argnames=("config", "n_iter"))
def fit_scan(state, data, config, n_iter):
    """Run ``n_iter`` fit iterations as one compiled scan.

    Returns (final_state, losses (n_iter,)).
    """
    def body(s, _):
        return fit_step(s, data, config)

    state = pack_state(state, config)
    out, losses = jax.lax.scan(body, state, None, length=n_iter)
    return unpack_state(out, config), losses
