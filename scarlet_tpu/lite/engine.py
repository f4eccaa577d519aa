"""Compiled deblending engine: the whole proximal-Adam fit loop of a blend
as one jit-compiled ``lax.scan`` program.

This is the TPU-first reformulation of the reference's per-iteration Python
loop (scarlet/lite/models.py:589-624 + lite/parameters.py:274-305):

* all K components of a blend share one static (bucketed) box size, stored as
  structure-of-arrays ``seds (K, C)`` / ``morphs (K, Hb, Wb)`` /
  ``origins (K, 2)``;
* the scene is assembled by a ``lax.scan`` of dynamic-slice adds into a
  zero-padded scene (padding by one box size gives exact clipped-overlap
  semantics without index clamping);
* PSF (difference-kernel) convolution uses precomputed kernel rFFTs;
* gradients are the analytic lite gradients (convolve residual with the
  flipped kernel, then per-component einsum slices — lite/models.py:206-216,
  537-545);
* the adaprox update + morphology prox chain (monotonicity, background
  thresholding, center floor, max-normalization — lite/models.py:218-244)
  runs ``vmap``-ed over components;
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
from ..optim import AdaproxState, init_adaprox_state, adaprox_step

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
]


@dataclass(frozen=True)
class LiteFitConfig:
    """Static (hashable) fit configuration; changing any field triggers a
    re-jit, so these are knobs, not data."""
    scene_shape: tuple            # (C, H, W)
    box_shape: tuple              # (Hb, Wb), odd
    n_components: int             # K
    fft_shape: Optional[tuple]    # spatial FFT shape; None = no convolution
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
    neighbor_weight: str = "angle"
    mono_n_iter: int = 0          # filled in by monotonicity_tables
    use_pallas: bool = False      # VMEM-resident monotonicity kernel (TPU)
    pallas_interpret: bool = False
    scene_pad: int = -1           # -1: one full box (always safe)

    @property
    def pad(self):
        """Scene padding for exact clipped-overlap scatter-adds: must cover
        the largest out-of-scene box overhang."""
        if self.scene_pad >= 0:
            return self.scene_pad
        return max(self.box_shape)


class BlendData(NamedTuple):
    """Per-blend constants (batchable: add a leading axis + vmap).

    Kernel rFFTs are stored as stacked (real, imag) float arrays — the axon
    TPU backend cannot transfer complex buffers host->device, and float
    storage also shards/replicates uniformly; they are recombined to
    complex inside the compiled step (one free elementwise op).
    """
    images: jnp.ndarray          # (C, H, W)
    weights: jnp.ndarray         # (C, H, W)
    kernel_rfft: Optional[jnp.ndarray]       # (2, C, fh, fw//2+1) re/im
    grad_kernel_rfft: Optional[jnp.ndarray]  # (2, C, ...) flipped kernel
    bg_rms: jnp.ndarray          # (C,) noise RMS per band
    sed_step_min: jnp.ndarray    # (C,) minimum SED step
    mono_weights: jnp.ndarray    # (ncand, 8, Hb, Wb)
    mono_keep: jnp.ndarray       # (ncand, Hb, Wb) float 1.0 at frozen pixels
    fista_step: Optional[jnp.ndarray] = None  # (K,) base FISTA steps


class BlendState(NamedTuple):
    """Per-blend mutable fit state."""
    seds: jnp.ndarray            # (K, C)
    morphs: jnp.ndarray          # (K, Hb, Wb)
    origins: jnp.ndarray         # (K, 2) int32, scene coords of box corner
    comp_active: jnp.ndarray     # (K,) bool, False for padded null slots
    sed_opt: AdaproxState        # leaves (K, C)
    morph_opt: AdaproxState      # leaves (K, Hb, Wb)
    active: jnp.ndarray          # () bool — blend still iterating
    it: jnp.ndarray              # () int32 — iterations executed
    last_loss: jnp.ndarray       # () float — previous logL


# ---------------------------------------------------------------------------
# Setup helpers (host-side)
# ---------------------------------------------------------------------------
def monotonicity_tables(box_shape, fit_center_radius=1, neighbor_weight="angle"):
    """Stacked monotonicity weight tables for every candidate center in the
    (2r+1)^2 peak-search window around the box center.

    Returns (weights (ncand, 8, Hb, Wb), keep (ncand, Hb, Wb), n_iter).
    """
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
    return np.stack(weights), np.stack(keeps), n_iter


def make_blend_data(images, weights, diff_kernel, bg_rms, config,
                    sed_step_min=None):
    """Build the BlendData pytree: precompute kernel rFFTs and monotonicity
    tables for the configured box."""
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

    mono_w, mono_keep, _ = monotonicity_tables(
        config.box_shape, config.fit_center_radius, config.neighbor_weight
    )
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
        mono_weights=jnp.asarray(mono_w.astype(np.dtype(images.dtype))),
        mono_keep=jnp.asarray(mono_keep.astype(np.dtype(images.dtype))),
    )


def make_blend_state(seds, morphs, origins, comp_active=None,
                     sed_opt=None, morph_opt=None):
    seds = jnp.asarray(seds)
    morphs = jnp.asarray(morphs)
    if comp_active is None:
        comp_active = jnp.ones((seds.shape[0],), bool)
    return BlendState(
        seds=seds,
        morphs=morphs,
        origins=jnp.asarray(origins, jnp.int32),
        comp_active=jnp.asarray(comp_active),
        sed_opt=sed_opt if sed_opt is not None else init_adaprox_state(seds),
        morph_opt=morph_opt if morph_opt is not None
        else init_adaprox_state(morphs),
        active=jnp.asarray(True),
        it=jnp.asarray(0, jnp.int32),
        last_loss=jnp.asarray(jnp.inf),
    )


# ---------------------------------------------------------------------------
# Forward model
# ---------------------------------------------------------------------------
def make_scene(seds, morphs, origins, comp_active, config):
    """Scatter-add K factorized components into the scene.

    Works in a scene padded by one box size so partially-out-of-scene boxes
    clip exactly (dynamic_update_slice would otherwise clamp and shift).
    """
    C, H, W = config.scene_shape
    Hb, Wb = config.box_shape
    P = config.pad
    scene = jnp.zeros((C, H + 2 * P, W + 2 * P),
                      dtype=morphs.dtype)

    zero = jnp.asarray(0, jnp.int32)

    # unrolled over the (small, static) component count: XLA updates the
    # scene windows in place without scan carry copies
    K = seds.shape[0]
    for k in range(K):
        model = (seds[k][:, None, None] * morphs[k][None]) * comp_active[k]
        oy = origins[k, 0] + P
        ox = origins[k, 1] + P
        cur = jax.lax.dynamic_slice(scene, (zero, oy, ox), (C, Hb, Wb))
        scene = jax.lax.dynamic_update_slice(scene, cur + model,
                                             (zero, oy, ox))
    return scene[:, P:P + H, P:P + W]


def _split_complex(k):
    """Complex array -> stacked (2, ...) float re/im."""
    return jnp.stack([jnp.real(k), jnp.imag(k)])


def _join_complex(k):
    """Stacked (2, ...) float re/im -> complex."""
    return jax.lax.complex(k[0], k[1])


def _convolve(scene, kernel_rfft, config):
    if kernel_rfft is None:
        return scene
    return fft_ops.convolve_fft(scene, _join_complex(kernel_rfft),
                                config.fft_shape, (-2, -1))


def render(state, data, config):
    """Scene model convolved to the observed PSF."""
    scene = make_scene(state.seds, state.morphs, state.origins,
                       state.comp_active, config)
    return _convolve(scene, data.kernel_rfft, config)


# ---------------------------------------------------------------------------
# Morphology prox chain (batched over all K components at once)
# ---------------------------------------------------------------------------
def _prox_morph_batched(morphs, seds, data, config):
    """Monotonicity -> background threshold (or positivity) -> center floor
    -> max normalization, over the (K, Hb, Wb) component stack.

    Ref: lite/models.py:224-244.  The monotonicity projection runs either as
    the VMEM-resident Pallas kernel (TPU) or as fused XLA Jacobi passes.
    """
    K = morphs.shape[0]
    Hb, Wb = config.box_shape
    bc = (Hb // 2, Wb // 2)
    r = config.fit_center_radius

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
            morphs, idx, data.mono_weights, data.mono_keep,
            config.mono_n_iter, config.min_gradient,
            interpret=config.pallas_interpret)
    else:
        w = data.mono_weights[idx]       # (K, 8, Hb, Wb)
        keep = data.mono_keep[idx] > 0.5
        scale = 1.0 - config.min_gradient
        X0 = morphs

        def body(_, x):
            ref = jnp.zeros_like(x)
            for d, (dy, dx) in enumerate(prox_ops.NEIGHBOR_OFFSETS):
                ref = ref + w[:, d] * _shift_batch(x, dy, dx)
            return jnp.where(keep, X0, jnp.minimum(X0, ref * scale))

        morphs = jax.lax.fori_loop(0, config.mono_n_iter, body, X0)

    if config.bg_thresh is not None:
        model = seds[:, :, None, None] * morphs[:, None]
        cut = jnp.all(
            model < (config.bg_thresh * data.bg_rms)[None, :, None, None],
            axis=1)
        morphs = jnp.where(cut, 0.0, morphs)
    else:
        morphs = jnp.maximum(morphs, 0.0)

    center_val = jnp.maximum(morphs[:, bc[0], bc[1]], config.floor)
    morphs = morphs.at[:, bc[0], bc[1]].set(center_val)
    return morphs / jnp.max(morphs, axis=(-2, -1), keepdims=True)


def _shift_batch(x, dy, dx):
    """n[., y, x] = X[., y+dy, x+dx], zero outside (batched leading axis)."""
    pad = ((0, 0), (max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)))
    padded = jnp.pad(x, pad)
    H, W = x.shape[-2:]
    y0, x0 = max(0, dy), max(0, dx)
    return padded[..., y0:y0 + H, x0:x0 + W]


# ---------------------------------------------------------------------------
# One fit iteration
# ---------------------------------------------------------------------------
def fit_step(state, data, config):
    """One adaprox iteration over all components of one blend.

    Returns (new_state, logL) with logL = -0.5 sum(w (model - img)^2)
    (the value the reference records in ``LiteBlend.loss``,
    lite/models.py:541).
    """
    C, H, W = config.scene_shape
    Hb, Wb = config.box_shape
    P = config.pad

    scene = make_scene(state.seds, state.morphs, state.origins,
                       state.comp_active, config)
    model = _convolve(scene, data.kernel_rfft, config)
    residual = data.weights * (model - data.images)
    logL = -0.5 * jnp.sum(residual * (model - data.images))

    grad_scene = _convolve(residual, data.grad_kernel_rfft, config)
    gpad = jnp.pad(grad_scene, ((0, 0), (P, P), (P, P)))

    zero = jnp.asarray(0, jnp.int32)

    def grads(origin, sed, morph):
        g = jax.lax.dynamic_slice(
            gpad, (zero, origin[0] + P, origin[1] + P), (C, Hb, Wb)
        )
        g_sed = jnp.einsum("chw,hw->c", g, morph)
        g_morph = jnp.einsum("c,chw->hw", sed, g)
        return g_sed, g_morph

    g_seds, g_morphs = jax.vmap(grads)(state.origins, state.seds, state.morphs)

    it = state.it
    active = state.active

    if config.optimizer == "fista":
        # FISTA steps scale by the squared norm of the other factor
        # (lite/parameters.py:133-146)
        from ..optim import fista_step

        def update_sed(sed, g, opt, base, morph):
            step = base / jnp.maximum(jnp.sum(morph * morph), 1e-12)
            return fista_step(
                sed, g, it, opt, step,
                prox=lambda x, s: jnp.maximum(x, config.floor))

        new_seds, new_sed_opt = jax.vmap(update_sed)(
            state.seds, g_seds, state.sed_opt, data.fista_step, state.morphs)
        gate_sed = (active & state.comp_active)[:, None]
        new_seds = jnp.where(gate_sed, new_seds, state.seds)
        new_sed_opt = jax.tree.map(
            lambda new, old: jnp.where(
                gate_sed if new.ndim == 2 else (active & state.comp_active),
                new, old),
            new_sed_opt, state.sed_opt)

        # gradient-extrapolation step y = z - step*g; the batched prox chain
        # below produces x_{k+1}, and the t/z acceleration update follows
        # (Beck & Teboulle ordering, lite/parameters.py:133-146)
        def morph_y(g, opt, base, sed):
            step = base / jnp.maximum(jnp.sum(sed * sed), 1e-12)
            return opt.z - step * g

        stepped_morphs = jax.vmap(morph_y)(
            g_morphs, state.morph_opt, data.fista_step, state.seds)
        new_morph_opt = None  # finalized after the prox chain
    else:
        # --- SED update (relative step with a noise-floor minimum,
        #     lite/initialization.py:275-279) ---
        def update_sed(sed, g, opt, on):
            step = jnp.maximum(data.sed_step_min,
                               config.sed_step_factor * jnp.mean(sed))
            return adaprox_step(
                sed, g, it, opt, step,
                prox=lambda x, s: jnp.maximum(x, config.floor),
                scheme=config.scheme, b1=config.b1, b2=config.b2,
                eps=config.eps, p=config.p,
                max_prox_iter=config.max_prox_iter,
                active=active & on,
            )

        new_seds, new_sed_opt = jax.vmap(update_sed)(
            state.seds, g_seds, state.sed_opt, state.comp_active
        )

        # --- morphology update (constant step; prox chain applied with the
        #     *new* SED, matching lite/models.py:246-252).  The gradient step
        #     runs vmapped per component; the prox chain runs batched over
        #     the whole component stack so the monotonicity kernel sees one
        #     call.
        def update_morph(morph, g, opt):
            return adaprox_step(
                morph, g, it, opt, config.morph_step, prox=None,
                scheme=config.scheme, b1=config.b1, b2=config.b2,
                eps=config.eps, p=config.p,
                max_prox_iter=config.max_prox_iter,
            )

        stepped_morphs, new_morph_opt = jax.vmap(update_morph)(
            state.morphs, g_morphs, state.morph_opt
        )
    proxed_morphs = _prox_morph_batched(stepped_morphs, new_seds, data, config)

    if config.optimizer == "fista":
        from ..optim import FistaState

        def morph_accel(x_old, x_new, opt):
            t_new = 0.5 * (1 + jnp.sqrt(1 + 4 * opt.t ** 2))
            omega = 1 + (opt.t - 1) / t_new
            return FistaState(z=x_old + omega * (x_new - x_old), t=t_new)

        new_morph_opt = jax.vmap(morph_accel)(
            state.morphs, proxed_morphs, state.morph_opt)

    gate = (active & state.comp_active)[:, None, None]
    new_morphs = jnp.where(gate, proxed_morphs, state.morphs)
    new_morph_opt = jax.tree.map(
        lambda new, old: jnp.where(
            gate if new.ndim == 3 else (active & state.comp_active),
            new, old),
        new_morph_opt, state.morph_opt,
    )

    # --- convergence: |dL| < e_rel |L| after min_iter (lite/models.py:618) ---
    converged = (it > config.min_iter) & (
        jnp.abs(logL - state.last_loss) < config.e_rel * jnp.abs(logL)
    )
    new_active = active & ~converged

    new_state = BlendState(
        seds=new_seds,
        morphs=new_morphs,
        origins=state.origins,
        comp_active=state.comp_active,
        sed_opt=new_sed_opt,
        morph_opt=new_morph_opt,
        active=new_active,
        it=state.it + active.astype(jnp.int32),
        last_loss=jnp.where(active, logL, state.last_loss),
    )
    return new_state, logL


@partial(jax.jit, static_argnames=("config", "n_iter"))
def fit_scan(state, data, config, n_iter):
    """Run ``n_iter`` fit iterations as one compiled scan.

    Returns (final_state, losses (n_iter,)).
    """
    def body(s, _):
        return fit_step(s, data, config)

    return jax.lax.scan(body, state, None, length=n_iter)
