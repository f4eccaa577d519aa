"""Pallas TPU kernels for the hot proximal operators.

The monotonicity projection is the dominant cost of the batched fit: the
XLA formulation re-reads the morphology stack from HBM for each of the
``n_iter`` Jacobi passes (8 shifted multiply-adds each), making it
HBM-bound.  The Pallas kernel below keeps each morphology resident in VMEM
for the whole fixed-point iteration — one HBM read and one write per
morphology regardless of depth — turning the prox into pure VPU work.

Shifted neighbors use circular ``pltpu.roll``; wrap-around contributions
are annihilated by the weight tables, which are zero wherever the neighbor
is out of bounds (see ops/prox.py:monotonic_weights).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .prox import NEIGHBOR_OFFSETS

__all__ = ["batched_monotonic_prox", "monotonic_prox_packed",
           "monotonic_prox_packed_chain", "fused_morph_update",
           "scene_assembly", "grad_gather"]


# Jacobi passes per convergence reduce in the mono while-loops.  4 is
# the shipped default and the measured production optimum:
# tools/mono_pass_attrib.py put UNROLL=8 at -3.9% per-pass cost (fewer
# reduce+carry syncs), but the exit quantizes to UNROLL passes, so the
# production A/B (tools/mono_unroll_ab.py) came back 0.972x at
# identical losses — BASELINE r5.  Kept as a module constant so future
# hardware can re-A/B with one flip.
MONO_UNROLL = 4


def _mono_kernel(idx_ref, *refs, n_iter, scale, group, Wb, tol=0.0,
                 dynamic_tol=False):
    """One grid step processes ``group`` morphologies packed side by side
    along the lane axis as (Hb, group*Wb): shifts are circular rolls of one
    wide 2D array (full VPU lane utilization).  Rolls leak across morph
    boundaries and wrap around edges, but both land on pixels whose
    corresponding neighbor weight is zero (out-of-bounds neighbors),
    exactly like the circular-wrap argument for a single morphology.

    The pass is factored by the x-offset: the reference value
    ``sum_d w_d(p) x(p+dy_d, p+dx_d)`` is evaluated as
    ``S_0 + roll_x(S_-1, -1) + roll_x(S_+1, +1)`` with
    ``S_dx = sum_dy w'_{dy,dx} * roll_y(x, dy)`` and the weight tables
    pre-shifted along x at gather time (``w'(q) = w(q - dx)``), so every
    Jacobi pass costs 4 rolls instead of 12.  Pre-shifting is exact: the
    columns a shifted table exposes at morph boundaries are out-of-bounds
    weights, which are zero.

    Per-morph candidate weight tables are gathered into VMEM scratch once
    per group, amortized over all passes.

    With ``dynamic_tol`` the exit tolerance is a TRACED per-call scalar
    (second scalar-prefetch operand, SMEM) instead of the static ``tol``
    — the iteration-scheduled tolerance (LiteFitConfig.mono_tol_early)
    switches tolerances mid-program without compiling a second fit."""
    if dynamic_tol:
        (tol_ref, x_ref, wtab_ref, keep_ref, out_ref, wsel_ref,
         keepsel_ref) = refs
    else:
        x_ref, wtab_ref, keep_ref, out_ref, wsel_ref, keepsel_ref = refs
    k = pl.program_id(0)
    Hb = x_ref.shape[-2]
    wsel_ref[...] = jnp.zeros(wsel_ref.shape, wsel_ref.dtype)
    for g in range(group):
        ci = idx_ref[k * group + g]
        c0 = g * Wb
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            # w'(q) = w(q - dx): shift content right by dx (zero edge col)
            lo, hi = max(0, dx), Wb + min(0, dx)
            wsel_ref[d, :, c0 + lo:c0 + hi] = \
                wtab_ref[ci, d][:, lo - dx:hi - dx]
        keepsel_ref[:, c0:c0 + Wb] = keep_ref[ci]

    x0 = x_ref[0]
    w = wsel_ref[:]
    keep_b = keepsel_ref[:] > 0.5
    gW = group * Wb

    def step(x):
        rows = {
            -1: pltpu.roll(x, 1, 0),          # X[y-1]  (dy = -1)
            0: x,
            1: pltpu.roll(x, Hb - 1, 0),      # X[y+1]  (dy = +1)
        }
        cols = {-1: None, 0: None, 1: None}
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            t = w[d] * rows[dy]
            cols[dx] = t if cols[dx] is None else cols[dx] + t
        ref = (cols[0]
               + pltpu.roll(cols[-1], 1, 1)    # shift_x by -1
               + pltpu.roll(cols[1], gW - 1, 1))  # shift_x by +1
        if scale != 1.0:                       # static (min_gradient == 0)
            ref = ref * scale
        new = jnp.minimum(x0, ref)
        return jnp.where(keep_b, x0, new)

    # ``n_iter`` (the DAG depth) is a worst-case bound; the iteration hits
    # its bitwise fixed point as soon as one pass changes nothing, and the
    # sequential-sweep result is exactly that fixed point — so early exit
    # is exact, and real morphologies converge far before the bound.
    # Passes run in blocks of UNROLL with one convergence reduce per block
    # (comparing the last two passes — extra passes beyond the fixed point
    # are idempotent, so blocking stays exact).
    #
    # ``tol > 0`` relaxes the exit to max|delta| <= tol between blocks
    # (morphologies are max-normalized each iteration, so tol is relative
    # to a unit peak).  NOT exact reference semantics — opt-in via
    # LiteFitConfig.mono_tol, A/B'd in BASELINE before any use.
    UNROLL = MONO_UNROLL

    def cond(carry):
        t, _, changed = carry
        return changed & (t < n_iter)

    def body(carry):
        t, x, _ = carry
        for _ in range(UNROLL - 1):
            x = step(x)
        new = step(x)
        if dynamic_tol:
            # max|delta| > tol with a TRACED tol; at tol == 0.0 this is
            # exactly the bitwise any(new != x) exit (finite values)
            changed = jnp.max(jnp.abs(new - x)) > tol_ref[0]
        elif tol > 0.0:
            changed = jnp.max(jnp.abs(new - x)) > tol
        else:
            changed = jnp.any(new != x)
        return t + UNROLL, new, changed

    _, out, _ = jax.lax.while_loop(cond, body, (0, x0, True))
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("n_iter", "min_gradient",
                                             "interpret", "group", "tol"))
def batched_monotonic_prox(morphs, idx, weights_table, keep_table, n_iter,
                           min_gradient=0.0, interpret=False, group=None,
                           tol=0.0, tol_arr=None):
    """Radially monotonic projection of a stack of morphologies.

    Parameters
    ----------
    morphs: (K, Hb, Wb) float32 — input morphologies
    idx: (K,) int32 — candidate-center index per morphology
    weights_table: (ncand, 8, Hb, Wb) float32
    keep_table: (ncand, Hb, Wb) float32 — 1.0 at the (never-updated) center
    n_iter: static int — Jacobi passes (the DAG depth for exactness)
    group: static int — morphologies per grid step (batched rolls);
        None picks the whole stack when it fits a lane budget, so no grid
        step processes padding slots

    Equivalent to ``prox_weighted_monotonic`` per slice with the selected
    weight table; exact for ``n_iter >= monotonic_depth``.
    """
    K, Hb, Wb = morphs.shape
    if group is None:
        # one grid step for the whole stack when the packed width stays
        # within a healthy lane budget (avoids processing padding slots)
        group = K if K * Wb <= 4096 else 8
    group = max(1, min(group, K))
    K_pad = -(-K // group) * group
    if K_pad != K:
        morphs = jnp.concatenate(
            [morphs, jnp.zeros((K_pad - K, Hb, Wb), morphs.dtype)])
        idx = jnp.concatenate(
            [idx, jnp.zeros((K_pad - K,), idx.dtype)])

    n_groups = K_pad // group
    # pack each group side-by-side along lanes: (n_groups, Hb, group*Wb)
    packed = morphs.reshape(n_groups, group, Hb, Wb)
    packed = jnp.swapaxes(packed, 1, 2).reshape(n_groups, Hb, group * Wb)

    dynamic = tol_arr is not None
    kernel = functools.partial(_mono_kernel, n_iter=n_iter,
                               scale=1.0 - min_gradient, group=group, Wb=Wb,
                               tol=float(tol), dynamic_tol=dynamic)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if dynamic else 1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, Hb, group * Wb), lambda k, *s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full weights table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full keep table
        ],
        out_specs=pl.BlockSpec((1, Hb, group * Wb), lambda k, *s: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, Hb, group * Wb), morphs.dtype),
            pltpu.VMEM((Hb, group * Wb), morphs.dtype),
        ],
    )
    args = (idx, tol_arr.reshape(1).astype(morphs.dtype)) if dynamic \
        else (idx,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_groups, Hb, group * Wb),
                                       morphs.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*args, packed, weights_table, keep_table)
    out = out.reshape(n_groups, Hb, group, Wb)
    out = jnp.swapaxes(out, 1, 2).reshape(K_pad, Hb, Wb)
    return out[:K]


@functools.partial(jax.jit, static_argnames=("Wb", "n_iter", "min_gradient",
                                             "interpret", "tol"))
def monotonic_prox_packed(packed, idx, weights_table, keep_table, Wb,
                          n_iter, min_gradient=0.0, interpret=False,
                          tol=0.0, tol_arr=None):
    """Monotonicity projection on an ALREADY lane-packed (Hb, K*Wb) stack
    (slot k in columns [k*Wb, (k+1)*Wb)) — the persistent packed-layout
    hot path: no per-call pack/unpack transposes (those HBM layout copies
    cost ~25% of a fit iteration when morphs round-trip every step).

    ``idx``: (K,) candidate-center index per slot.  Same semantics as
    :func:`batched_monotonic_prox` with group == K.
    """
    Hb, gW = packed.shape
    K = gW // Wb
    dynamic = tol_arr is not None
    kernel = functools.partial(_mono_kernel, n_iter=n_iter,
                               scale=1.0 - min_gradient, group=K, Wb=Wb,
                               tol=float(tol), dynamic_tol=dynamic)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if dynamic else 1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, Hb, gW), lambda k, *s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hb, gW), lambda k, *s: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, Hb, gW), packed.dtype),
            pltpu.VMEM((Hb, gW), packed.dtype),
        ],
    )
    args = (idx, tol_arr.reshape(1).astype(packed.dtype)) if dynamic \
        else (idx,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Hb, gW), packed.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*args, packed[None], weights_table, keep_table)
    return out[0]


def _mono_chain_kernel(idx_ref, xorig_ref, x_ref, wtab_ref, keep_ref,
                       thr_ref, gate_ref, out_ref, wsel_ref, keepsel_ref,
                       *, n_iter, scale, group, Wb, floor, tol):
    """:func:`_mono_kernel` plus the rest of the packed morphology prox
    chain IN the kernel — background threshold, center floor, per-slot
    max normalization, and the converged-slot gating
    ``where(gate, new, x_orig)`` — with the output aliased onto
    ``x_orig``'s buffer.

    Why: the r4 xplane profile shows the while-loop carry of the packed
    morphs stored batch-minor ({0,2,1}) to please the XLA reshape/max
    fusion of the normalization, while Mosaic requires default layout —
    so XLA transposes the (B, Hb, K*Wb) stack INTO and OUT OF the kernel
    every iteration (2 x 0.70 ms at B=128 = 26% of the fit iteration).
    With the whole chain in-kernel and the carry aliased, no XLA op with
    a layout preference touches the packed buffer and the transposes
    vanish.
    """
    k = pl.program_id(0)
    Hb = x_ref.shape[-2]
    wsel_ref[...] = jnp.zeros(wsel_ref.shape, wsel_ref.dtype)
    for g in range(group):
        ci = idx_ref[k * group + g]
        c0 = g * Wb
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            lo, hi = max(0, dx), Wb + min(0, dx)
            wsel_ref[d, :, c0 + lo:c0 + hi] = \
                wtab_ref[ci, d][:, lo - dx:hi - dx]
        keepsel_ref[:, c0:c0 + Wb] = keep_ref[ci]

    x0 = x_ref[0]
    w = wsel_ref[:]
    keep_b = keepsel_ref[:] > 0.5
    gW = group * Wb

    def step(x):
        rows = {
            -1: pltpu.roll(x, 1, 0),
            0: x,
            1: pltpu.roll(x, Hb - 1, 0),
        }
        cols = {-1: None, 0: None, 1: None}
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            t = w[d] * rows[dy]
            cols[dx] = t if cols[dx] is None else cols[dx] + t
        ref = (cols[0]
               + pltpu.roll(cols[-1], 1, 1)
               + pltpu.roll(cols[1], gW - 1, 1))
        if scale != 1.0:
            ref = ref * scale
        new = jnp.minimum(x0, ref)
        return jnp.where(keep_b, x0, new)

    UNROLL = MONO_UNROLL

    def cond(carry):
        t, _, changed = carry
        return changed & (t < n_iter)

    def body(carry):
        t, x, _ = carry
        for _ in range(UNROLL - 1):
            x = step(x)
        new = step(x)
        if tol > 0.0:
            changed = jnp.max(jnp.abs(new - x)) > tol
        else:
            changed = jnp.any(new != x)
        return t + UNROLL, new, changed

    _, out, _ = jax.lax.while_loop(cond, body, (0, x0, True))

    # background threshold / positivity (engine._prox_morph_bucket_packed:
    # thr row is the per-slot pixel cutoff min_c t_c/sed_c, 0 = clamp)
    thr = thr_ref[0]
    out = jnp.where(out < thr, jnp.zeros_like(out), out)

    # center floor + per-slot max normalization (selects; no scatter)
    rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    center_mask = (rows == Hb // 2) & (colm % Wb == Wb // 2)
    out = jnp.where(center_mask, jnp.maximum(out, floor), out)
    mxrow = jnp.ones_like(out)
    for g in range(group):
        mx = jnp.max(out[:, g * Wb:(g + 1) * Wb])
        mxrow = jnp.where(colm // Wb == g, mx, mxrow)
    out = out / mxrow

    gate = gate_ref[0] > 0.5
    out_ref[0] = jnp.where(gate, out, xorig_ref[0])


@functools.partial(jax.jit, static_argnames=(
    "Wb", "n_iter", "min_gradient", "floor", "interpret", "tol"))
def monotonic_prox_packed_chain(x_orig, stepped, idx, weights_table,
                                keep_table, thr_row, gate_row, Wb, n_iter,
                                min_gradient=0.0, floor=1e-20,
                                interpret=False, tol=0.0):
    """Whole packed morphology prox chain as ONE VMEM kernel with the
    output aliased onto the ``x_orig`` carry buffer (in-place update of
    the fit loop's packed morphology stack — see
    :func:`_mono_chain_kernel` for the layout rationale).

    Parameters
    ----------
    x_orig : (Hb, K*Wb) — the CURRENT carry morphs (returned unchanged
        for gated-off slots); the output reuses this buffer.
    stepped : (Hb, K*Wb) — the adaprox-stepped, box-mask-confined morphs.
    thr_row, gate_row : (K*Wb,) per-slot rows (threshold cutoff and
        0/1 update gate, replicated across each slot's lane block).
    """
    Hb, gW = stepped.shape
    K = gW // Wb
    kernel = functools.partial(_mono_chain_kernel, n_iter=n_iter,
                               scale=1.0 - min_gradient, group=K, Wb=Wb,
                               floor=floor, tol=float(tol))
    block = pl.BlockSpec((1, Hb, gW), lambda k, idx: (k, 0, 0),
                         memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, 1, gW), lambda k, idx: (k, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            block,                                   # x_orig (aliased)
            block,                                   # stepped
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # keep table
            row_block,                               # thr row
            row_block,                               # gate row
        ],
        out_specs=block,
        scratch_shapes=[
            pltpu.VMEM((8, Hb, gW), stepped.dtype),
            pltpu.VMEM((Hb, gW), stepped.dtype),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Hb, gW), stepped.dtype),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},   # x_orig's buffer becomes the out
        interpret=interpret,
    )(idx, x_orig[None], stepped[None], weights_table, keep_table,
      thr_row.reshape(1, 1, gW), gate_row.reshape(1, 1, gW))
    return out[0]


# ---------------------------------------------------------------------------
# Fused adaprox morphology update (moments + step + prox chain, one pass)
# ---------------------------------------------------------------------------
def _fused_morph_kernel(x_ref, g_ref, m_ref, v_ref, vh_ref, bm_ref, thr_ref,
                        gate_ref, wtab_ref, keep_ref, sc_ref,
                        xo_ref, mo_ref, vo_ref, vho_ref,
                        wsel_ref, keepsel_ref, *,
                        n_iter, scale, group, Wb, bc, r, b1, b2, eps,
                        floor):
    """Per lane-packed group: amsgrad moment update -> damped step ->
    box-mask confinement -> candidate-center argmax -> monotonicity fixed
    point -> threshold cut -> center floor -> max normalization, all
    VMEM-resident.  One HBM read of (x, g, m, v, vhat, masks) and one
    write of (x', m', v', vhat') per morphology per iteration, replacing
    the separate XLA optimizer pass + the mono kernel + the XLA prox-chain
    ops.

    ``thr_ref``/``gate_ref`` are (1, group*Wb) per-slot rows (threshold
    value and 0/1 activity, replicated across each slot's lane block);
    ``sc_ref`` is a (1, 1) SMEM scalar holding damp*step (damped 10x at
    it == 0, optim.adaprox_step:147).
    """
    Hb = x_ref.shape[-2]
    x = x_ref[0]
    g = g_ref[0]
    ds = sc_ref[0, 0]

    # amsgrad moments (optim.phi_psi:94-98)
    m2 = (1.0 - b1) * g + b1 * m_ref[0]
    v2 = (1.0 - b2) * (g * g) + b2 * v_ref[0]
    vh2 = jnp.maximum(vh_ref[0], v2)
    x1 = (x - ds * m2 / (jnp.sqrt(vh2) + eps)) * bm_ref[0]

    # candidate-center selection (engine._prox_morph_bucket:377-382) and
    # per-slot weight-table gather, from the stepped+masked morphs; the
    # argmax unrolls to scalar compares (first max wins, like jnp.argmax)
    wsel_ref[...] = jnp.zeros(wsel_ref.shape, wsel_ref.dtype)
    for gslot in range(group):
        c0 = gslot * Wb
        ci = jnp.asarray(0, jnp.int32)
        bv = x1[bc[0] - r, c0 + bc[1] - r]
        t = 0
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if t > 0:
                    val = x1[bc[0] + dy, c0 + bc[1] + dx]
                    take = val > bv
                    ci = jnp.where(take, t, ci)
                    bv = jnp.where(take, val, bv)
                t += 1
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            lo, hi = max(0, dx), Wb + min(0, dx)
            wsel_ref[d, :, c0 + lo:c0 + hi] = \
                wtab_ref[ci, d][:, lo - dx:hi - dx]
        keepsel_ref[:, c0:c0 + Wb] = keep_ref[ci]

    w = wsel_ref[:]
    keep_b = keepsel_ref[:] > 0.5
    gW = group * Wb

    def step(xx):
        rows = {
            -1: pltpu.roll(xx, 1, 0),
            0: xx,
            1: pltpu.roll(xx, Hb - 1, 0),
        }
        cols = {-1: None, 0: None, 1: None}
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            t = w[d] * rows[dy]
            cols[dx] = t if cols[dx] is None else cols[dx] + t
        ref = (cols[0]
               + pltpu.roll(cols[-1], 1, 1)
               + pltpu.roll(cols[1], gW - 1, 1))
        if scale != 1.0:
            ref = ref * scale
        new = jnp.minimum(x1, ref)
        return jnp.where(keep_b, x1, new)

    UNROLL = MONO_UNROLL

    def cond(carry):
        t, _, changed = carry
        return changed & (t < n_iter)

    def body(carry):
        t, xx, _ = carry
        for _ in range(UNROLL - 1):
            xx = step(xx)
        new = step(xx)
        return t + UNROLL, new, jnp.any(new != xx)

    _, out, _ = jax.lax.while_loop(cond, body, (0, x1, True))

    # background threshold / positivity (engine._prox_morph_bucket:405-413;
    # thr row is 0 for the bg_thresh=None clamp, min_c t_c/sed_c otherwise)
    thr = thr_ref[0]
    out = jnp.where(out < thr, jnp.zeros_like(out), out)

    # center floor + per-slot max normalization (engine:415-417) — pure
    # selects (Mosaic has no scatter): the centers of all slots form a
    # static mask; the per-slot 1/max scale row builds by select too
    rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    center_mask = (rows == bc[0]) & (colm % Wb == bc[1])
    out = jnp.where(center_mask, jnp.maximum(out, floor), out)
    gate = gate_ref[0] > 0.5
    mxrow = jnp.ones_like(out)
    for gslot in range(group):
        mx = jnp.max(out[:, gslot * Wb:(gslot + 1) * Wb])
        mxrow = jnp.where(colm // Wb == gslot, mx, mxrow)
    out = out / mxrow

    xo_ref[0] = jnp.where(gate, out, x)
    mo_ref[0] = jnp.where(gate, m2, m_ref[0])
    vo_ref[0] = jnp.where(gate, v2, v_ref[0])
    vho_ref[0] = jnp.where(gate, vh2, vh_ref[0])


@functools.partial(jax.jit, static_argnames=(
    "n_iter", "min_gradient", "fit_center_radius", "b1", "b2", "eps",
    "floor", "interpret", "group"))
def fused_morph_update(morphs, grads, opt, gate, weights_table, keep_table,
                       box_masks, thr, damp_step, n_iter, min_gradient=0.0,
                       fit_center_radius=1, b1=0.9, b2=0.999, eps=1e-8,
                       floor=1e-20, interpret=False, group=None):
    """Fused adaprox morphology update for one bucket's (K, Hb, Wb) stack.

    Equivalent to the engine's sequence
    ``adaprox_step(prox=None)`` -> ``_prox_morph_bucket`` -> activity
    gating, with the background threshold expressed as the per-slot pixel
    cutoff ``thr_k = min_c bg_thresh*bg_rms_c/sed_kc`` (0 for the
    positivity clamp) — one VMEM-resident pass.

    Parameters beyond :func:`batched_monotonic_prox`:
    grads, opt : the morphology gradients and AdaproxState (m, v, vhat)
    gate : (K,) bool — slots whose update applies (active & comp_active)
    thr : (K,) float — per-slot threshold cut value
    damp_step : traced scalar — step * (0.1 at it==0 else 1)

    Returns (new_morphs, new AdaproxState).
    """
    K, Hb, Wb = morphs.shape
    if group is None:
        group = K if K * Wb <= 4096 else 8
    group = max(1, min(group, K))
    K_pad = -(-K // group) * group

    def pad_k(x, fill=0):
        if K_pad == K:
            return x
        return jnp.concatenate(
            [x, jnp.full((K_pad - K,) + x.shape[1:], fill, x.dtype)])

    def pack(x):
        p = pad_k(x).reshape(K_pad // group, group, Hb, Wb)
        return jnp.swapaxes(p, 1, 2).reshape(-1, Hb, group * Wb)

    def unpack(x):
        u = x.reshape(-1, Hb, group, Wb)
        return jnp.swapaxes(u, 1, 2).reshape(K_pad, Hb, Wb)[:K]

    n_groups = K_pad // group
    dtype = morphs.dtype
    # per-slot rows replicated across each slot's lane block
    thr_row = jnp.repeat(pad_k(thr.astype(dtype)), Wb).reshape(
        n_groups, 1, group * Wb)
    gate_row = jnp.repeat(pad_k(gate.astype(dtype)), Wb).reshape(
        n_groups, 1, group * Wb)
    sc = jnp.asarray(damp_step, dtype).reshape(1, 1)

    bc = (Hb // 2, Wb // 2)
    kernel = functools.partial(
        _fused_morph_kernel, n_iter=n_iter, scale=1.0 - min_gradient,
        group=group, Wb=Wb, bc=bc, r=int(fit_center_radius), b1=b1, b2=b2,
        eps=eps, floor=floor)

    block = pl.BlockSpec((1, Hb, group * Wb), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, 1, group * Wb), lambda k: (k, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_groups,),
        in_specs=[
            block,                                    # x
            block,                                    # g
            block,                                    # m
            block,                                    # v
            block,                                    # vhat
            block,                                    # box mask
            row_block,                                # thr row
            row_block,                                # gate row
            pl.BlockSpec(memory_space=pltpu.VMEM),    # weights table
            pl.BlockSpec(memory_space=pltpu.VMEM),    # keep table
            pl.BlockSpec(memory_space=pltpu.SMEM),    # damp*step scalar
        ],
        out_specs=[block, block, block, block],
        scratch_shapes=[
            pltpu.VMEM((8, Hb, group * Wb), dtype),
            pltpu.VMEM((Hb, group * Wb), dtype),
        ],
    )
    xo, mo, vo, vho = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n_groups, Hb, group * Wb), dtype)
                   for _ in range(4)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(pack(morphs), pack(grads), pack(opt.m), pack(opt.v), pack(opt.vhat),
      pack(box_masks), thr_row, gate_row, weights_table, keep_table, sc)

    from ..optim import AdaproxState

    return unpack(xo), AdaproxState(m=unpack(mo), v=unpack(vo),
                                    vhat=unpack(vho))


# ---------------------------------------------------------------------------
# Scene assembly and gradient gathering
# ---------------------------------------------------------------------------
def _scene_kernel(org_ref, seds_ref, morphs_ref, out_ref, *, K, hb, wb, P,
                  packed=False):
    """Accumulate each component's factorized model into the padded scene,
    entirely in VMEM (no HBM round trips per component, unlike vmapped
    dynamic_update_slice).  The sed x morph outer product forms IN VMEM per
    slot — the (K, C, hb, wb) model stack is never materialized in HBM.

    Mosaic does not lower dynamic offsets on the lane dimension, so the
    x-placement pads each morphology to the full lane width and rotates it
    into column position with one dynamic circular roll
    (tpu.dynamic_rotate; requires lane dim % 128 == 0); origins are
    clamped to [0, dim - box] by the caller's padding, so the rotation
    never wraps.  The y-placement is a dynamic-sublane-offset
    read-modify-write, which Mosaic does support, so only a (C, hb, Wp)
    band is touched per component."""
    Wp = out_ref.shape[-1]
    C = out_ref.shape[0]
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    for k in range(K):
        oy = org_ref[2 * k] + P
        ox = org_ref[2 * k + 1] + P
        if packed:    # slot k = a lane block of the (hb, K*wb) layout
            mk = morphs_ref[:, k * wb:(k + 1) * wb]
        else:
            mk = morphs_ref[k]
        m = jnp.pad(mk, ((0, 0), (0, Wp - wb)))              # (hb, Wp)
        m = pltpu.roll(m, ox, 1)
        for c in range(C):          # scalar sed x 2D tile (Mosaic-friendly)
            cur = out_ref[c, pl.ds(oy, hb), :]
            out_ref[c, pl.ds(oy, hb), :] = cur + seds_ref[k, c] * m


@functools.partial(jax.jit, static_argnames=("scene_shape", "pad",
                                             "interpret", "box_shape"))
def scene_assembly(seds, morphs, origins, comp_active, scene_shape, pad,
                   interpret=False, box_shape=None):
    """Scatter-add (K) factorized components into a padded scene, entirely
    in VMEM.  Returns the (C, H, W) cropped scene.

    ``morphs`` is (K, hb, wb), or — when ``box_shape=(hb, wb)`` is given —
    the lane-packed (hb, K*wb) layout (read in place, no transpose)."""
    K, C = seds.shape
    packed = box_shape is not None
    hb, wb = box_shape if packed else morphs.shape[-2:]
    H, W = scene_shape[1:]
    # Mosaic's dynamic rotate requires tile-aligned rotation dims:
    # sublanes % 8 == 0, lanes % 128 == 0.  The extra region stays zero and
    # is cropped away.
    Hp = -(-(H + 2 * pad) // 8) * 8
    Wp = -(-(W + 2 * pad) // 128) * 128

    gated = seds * comp_active[:, None].astype(seds.dtype)

    kernel = functools.partial(_scene_kernel, K=K, hb=hb, wb=wb, P=pad,
                               packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # seds
            pl.BlockSpec(memory_space=pltpu.VMEM),   # morphs
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    scene = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, Hp, Wp), morphs.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins.reshape(-1), gated, morphs)
    return scene[:, pad:pad + H, pad:pad + W]


def _grad_window_kernel(org_ref, gpad_ref, seds_ref, morphs_ref,
                        gsed_ref, gmorph_ref, *, K, hb, wb, P,
                        packed=False):
    """Slice each component's gradient band with a dynamic sublane offset,
    rotate its columns to the left edge (inverse of the scene kernel's
    placement), and contract IN VMEM: g_morph = sum_c sed_c * g_c and
    g_sed_c = sum_hw g_c * morph — the (K, C, hb, wb) gradient-window
    stack is never materialized in HBM.

    With ``packed``, morphs are read from and g_morphs written to the
    lane-packed (hb, K*wb) layout."""
    Wp = gpad_ref.shape[-1]
    C = gpad_ref.shape[0]
    for k in range(K):
        oy = org_ref[2 * k] + P
        ox = org_ref[2 * k + 1] + P
        if packed:
            morph = morphs_ref[:, k * wb:(k + 1) * wb]   # (hb, wb)
        else:
            morph = morphs_ref[k]                        # (hb, wb)
        gm = None
        for c in range(C):          # scalar ops only (Mosaic-friendly)
            g = gpad_ref[c, pl.ds(oy, hb), :]            # (hb, Wp)
            g = pltpu.roll(g, (Wp - ox) % Wp, 1)[:, :wb]
            t = seds_ref[k, c] * g
            gm = t if gm is None else gm + t
            gsed_ref[k, c] = jnp.sum(g * morph)
        if packed:
            gmorph_ref[:, k * wb:(k + 1) * wb] = gm
        else:
            gmorph_ref[k] = gm


@functools.partial(jax.jit, static_argnames=("pad", "interpret",
                                             "box_shape"))
def grad_gather(gpad, seds, morphs, origins, pad, interpret=False,
                box_shape=None):
    """Per-component (g_sed, g_morph) from the *padded* scene gradient
    ``gpad`` (padded by ``pad`` on both spatial sides), VMEM-resident.

    Returns ((K, C), (K, hb, wb)) — or ((K, C), (hb, K*wb)) when
    ``box_shape`` selects the lane-packed layout.
    """
    K, C = seds.shape
    packed = box_shape is not None
    hb, wb = box_shape if packed else morphs.shape[-2:]
    # tile-align the rotation dims (see scene_assembly)
    Hp, Wp = gpad.shape[-2:]
    Ht = -(-Hp // 8) * 8
    Wt = -(-Wp // 128) * 128
    if (Ht, Wt) != (Hp, Wp):
        gpad = jnp.pad(gpad, ((0, 0), (0, Ht - Hp), (0, Wt - Wp)))

    kernel = functools.partial(_grad_window_kernel, K=K, hb=hb, wb=wb,
                               P=pad, packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gpad
            pl.BlockSpec(memory_space=pltpu.VMEM),   # seds
            pl.BlockSpec(memory_space=pltpu.VMEM),   # morphs
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # per-slot sed scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    gmorph_shape = (hb, K * wb) if packed else (K, hb, wb)
    g_seds, g_morphs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((K, C), gpad.dtype),
            jax.ShapeDtypeStruct(gmorph_shape, gpad.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins.reshape(-1), gpad, seds, morphs)
    return g_seds, g_morphs
