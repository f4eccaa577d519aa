"""Batched deblending: thousands of blends per chip, sharded over a mesh.

``engine.fit_step`` is written per-blend with an ``active`` convergence mask,
so batching is exactly one ``vmap``: every blend in the batch stops updating
independently while the scan keeps running.  Heterogeneous blends (different
image sizes, component counts, box sizes) batch through a *shared static
layout* (``pack_blends``): scenes zero-pad to the largest (weight-0 padding
never enters the likelihood), component slots pad with ``comp_active=False``,
and every blend uses the common physical box / FFT shape.

The monotonicity weight tables are config-determined (identical across the
batch), so they are NOT stacked: ``fit_batch`` maps them with
``in_axes=None``, keeping one copy in HBM regardless of batch size.

Multi-chip scaling shards the batch ("blends") axis — and optionally the
band axis — with ``jax.sharding.NamedSharding``; blends are independent, so
the only cross-device traffic XLA inserts is for the optional band axis
(psum of per-band gradient contractions).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lite import engine
from ..ops import fft as fft_ops

__all__ = [
    "BatchConfig",
    "pack_batch",
    "pack_blends",
    "unpack_blends",
    "replicate_blend",
    "fit_batch",
    "fit_batch_converged",
    "fit_batch_device_converged",
    "fit_batch_device_dispatch",
    "fit_batch_device_collect",
    "make_mesh",
    "shard_batch",
]

BatchConfig = engine.LiteFitConfig

# BlendData fields shared (unbatched) across a batch: the monotonicity
# tables depend only on the static config
_SHARED_FIELDS = ("mono_weights", "mono_keep")


def _stack(pytrees):
    """Stack a list of identically-structured pytrees along a new leading
    axis (None leaves must agree)."""
    return jax.tree.map(
        lambda *xs: None if xs[0] is None else jnp.stack(xs), *pytrees,
        is_leaf=lambda x: x is None,
    )


def _data_in_axes(data):
    """``vmap`` axis spec for a batched BlendData: axis 0 everywhere except
    the shared monotonicity tables (and absent optional fields)."""
    return engine.BlendData(**{
        name: None if (name in _SHARED_FIELDS or getattr(data, name) is None)
        else 0
        for name in data._fields
    })


def pack_batch(blend_setups):
    """Stack per-blend (data, state) pairs into batch pytrees.

    All blends must share the same static config (scene shape, K, box
    size); use :func:`pack_blends` to build heterogeneous blends to a
    common layout first.  The shared monotonicity tables are taken from the
    first blend (they are config-determined).
    """
    datas, states = zip(*blend_setups)
    first = datas[0]
    stacked = _stack([
        d._replace(**{name: None for name in _SHARED_FIELDS}) for d in datas
    ])
    data = stacked._replace(**{
        name: getattr(first, name) for name in _SHARED_FIELDS
    })
    return data, _stack(states)


def pack_blends(blends, e_rel=1e-4, min_iter=1, platform=None):
    """Build N distinct ``LiteBlend``s to one shared static layout and
    stack them into batch pytrees.

    ``platform`` says where the fit will run ("cpu"/"tpu"; selects the
    Pallas kernels); default = the current jax context.

    The common layout is the elementwise maximum over the batch: scene
    shape, single-bucket box size, component-slot count, and FFT shape.
    Returns ``(config, data, state)`` ready for :func:`fit_batch`; write
    results back with :func:`unpack_blends`.

    This replaces the reference's serial per-blend loop
    (scarlet/testing/api.py:216-226) as the production many-blend path.
    """
    if not blends:
        raise ValueError("pack_blends needs at least one blend")
    shapes = [b.observation.shape for b in blends]
    C = shapes[0][0]
    if any(s[0] != C for s in shapes):
        raise ValueError(f"channel counts differ: {[s[0] for s in shapes]}")
    H = max(s[1] for s in shapes)
    W = max(s[2] for s in shapes)
    cap = max(H, W) + 1

    box = 1
    n_slots = 1
    for bl in blends:
        n_slots = max(n_slots, len(bl.components))
        for c in bl.components:
            s = min(max(c.bbox.shape[-2], c.bbox.shape[-1]), cap)
            box = max(box, s + (s % 2 == 0))

    fft_shape = None
    for bl in blends:
        dk = bl.observation.diff_kernel
        if dk is not None:
            fs = fft_ops.minimal_same_fft_shape(
                (C, H, W), np.asarray(dk.image).shape, axes=(1, 2))
            fft_shape = fs if fft_shape is None else tuple(
                max(a, b) for a, b in zip(fft_shape, fs))

    configs, setups = [], []
    for bl in blends:
        cfg, d, s = bl.engine_setup(
            e_rel, min_iter, scene_shape=(C, H, W), box_size=box,
            n_slots=n_slots, fft_shape=fft_shape, platform=platform)
        configs.append(cfg)
        setups.append((d, s))

    # scene_pad is overhang-derived per blend; the (static) config takes
    # the maximum — it only affects the traced scatter-add padding
    pad = max(c.scene_pad for c in configs)
    config = dataclasses.replace(configs[0], scene_pad=pad)
    for c in configs[1:]:
        if dataclasses.replace(c, scene_pad=pad) != config:
            raise ValueError(
                "blends produced incompatible engine configs "
                f"(e.g. mixed optimizers or renderers): {c} vs {config}")

    data, state = pack_batch(setups)
    return config, data, state


def unpack_blends(blends, state, losses=None, reweight=True):
    """Write a batched fit's results back onto the per-blend ``LiteBlend``
    objects: SEDs/morphologies/optimizer moments, iteration counts, and
    (optionally) per-blend loss histories from ``losses (n_iter, B)``.

    ``reweight`` applies the reference's post-fit flux redistribution
    (lite/measure.py:39-91) per blend.
    """
    from ..lite.measure import weight_sources

    if losses is not None:
        losses = np.asarray(losses)
    # one bulk device->host fetch; per-blend slicing then stays on the host
    # (slicing device arrays per blend costs thousands of tiny transfers),
    # and the write-back's small arrays are pinned to CPU so they don't
    # each round-trip through an accelerator
    state = jax.device_get(state)
    with jax.default_device(jax.devices("cpu")[0]):
        for i, bl in enumerate(blends):
            sub = jax.tree.map(lambda x: None if x is None else x[i],
                               state, is_leaf=lambda x: x is None)
            ran = int(sub.it) - bl.it
            if losses is not None and ran > 0:
                bl.loss.extend(losses[:ran, i].tolist())
            bl.it = int(sub.it)
            bl._write_back(sub)
            if reweight:
                weight_sources(bl)
    return blends


def replicate_blend(data, state, batch):
    """Tile one blend's (data, state) ``batch`` times (benchmarking); the
    shared monotonicity tables stay unbatched."""
    rep = lambda x: None if x is None else jnp.broadcast_to(  # noqa: E731
        x[None], (batch,) + x.shape)

    def rep_tree(t):
        return jax.tree.map(rep, t, is_leaf=lambda x: x is None)

    data = engine.BlendData(**{
        name: getattr(data, name) if name in _SHARED_FIELDS
        else rep_tree(getattr(data, name))
        for name in data._fields
    })
    return data, rep_tree(state)


def _fit_batch(state, data, config, n_iter):
    step = jax.vmap(lambda st, dt: engine.fit_step(st, dt, config),
                    in_axes=(0, _data_in_axes(data)))

    def body(s, _):
        return step(s, data)

    state = engine.pack_state(state, config)
    out, losses = jax.lax.scan(body, state, None, length=n_iter)
    return engine.unpack_state(out, config), losses


fit_batch = partial(jax.jit, static_argnames=("config", "n_iter"))(_fit_batch)

# Segment-loop variant: the input state buffers are donated so XLA aliases
# them with the output state (no fresh ~state-size allocation per segment).
_fit_batch_donating = partial(
    jax.jit, static_argnames=("config", "n_iter"), donate_argnums=(0,)
)(_fit_batch)


def _fit_batch_while(state, data, config, max_iter, check_every):
    """Whole batched fit as ONE device program: a ``lax.while_loop`` over
    ``check_every``-iteration scan segments that stops as soon as every
    blend's convergence mask clears.  No host round-trips (each
    between-segment sync costs ~50 ms over a TPU tunnel)."""
    check_every = min(check_every, max_iter)
    n_full = max_iter // check_every
    rem = max_iter - n_full * check_every
    B = state.active.shape[0]
    dtype = data.images.dtype      # logL dtype (last_loss may be widened)
    state = engine.pack_state(state, config)
    step = jax.vmap(lambda st, dt: engine.fit_step(st, dt, config),
                    in_axes=(0, _data_in_axes(data)))

    def run_seg(s, length):
        return jax.lax.scan(lambda ss, _: step(ss, data), s, None,
                            length=length)

    def seg(carry):
        s, losses, i = carry
        s2, seg_losses = run_seg(s, check_every)
        losses = jax.lax.dynamic_update_slice(
            losses, seg_losses,
            (i * check_every, jnp.asarray(0, i.dtype)))
        return s2, losses, i + 1

    def cond(carry):
        s, _, i = carry
        return jnp.any(s.active) & (i < n_full)

    losses0 = jnp.zeros((max_iter, B), dtype)
    out, losses, n_run = jax.lax.while_loop(
        cond, seg, (state, losses0, jnp.asarray(0, jnp.int32)))
    n_run = n_run * check_every
    if rem:
        # cap-exact tail: the last max_iter % check_every iterations run as
        # a fixed-length scan, skipped entirely if the batch converged
        def tail(args):
            s, losses = args
            s2, tail_losses = run_seg(s, rem)
            losses = jax.lax.dynamic_update_slice(
                losses, tail_losses,
                (jnp.asarray(n_full * check_every, jnp.int32),
                 jnp.asarray(0, jnp.int32)))
            return s2, losses, jnp.asarray(rem, jnp.int32)

        out, losses, n_tail = jax.lax.cond(
            jnp.any(out.active), tail,
            lambda args: (args[0], args[1], jnp.asarray(0, jnp.int32)),
            (out, losses))
        n_run = n_run + n_tail
    return engine.unpack_state(out, config), losses, n_run


_fit_batch_while_jit = partial(
    jax.jit, static_argnames=("config", "max_iter", "check_every"),
    donate_argnums=(0,),
)(_fit_batch_while)


def fit_batch_device_dispatch(state, data, config, max_iter,
                              check_every=10):
    """Asynchronously dispatch the single-program device-converged fit.

    Returns an opaque handle of device futures — the call does NOT block,
    so transfers/init of the next batch overlap this batch's fit (the
    chunked-stream pipeline).  Resolve with :func:`fit_batch_device_collect`.
    """
    state = jax.tree.map(
        lambda x: None if x is None else jnp.copy(x), state,
        is_leaf=lambda x: x is None)
    return _fit_batch_while_jit(state, data, config, max_iter, check_every)


def fit_batch_device_collect(handle, max_iter):
    """Block on a :func:`fit_batch_device_dispatch` handle; returns
    (final_state, losses (<=max_iter, B))."""
    out, losses, n_run = handle
    n = min(int(n_run), max_iter)
    return out, losses[:n]


def fit_batch_device_converged(state, data, config, max_iter,
                               check_every=10):
    """Fit until every blend converges (or ``max_iter``), with the
    convergence early-exit evaluated ON DEVICE every ``check_every``
    iterations — one compiled call, zero host syncs.

    Returns (final_state, losses (<=max_iter, B)) like
    :func:`fit_batch_converged`; rows past the executed count repeat the
    frozen losses (truncated here to the executed segments).
    """
    return fit_batch_device_collect(
        fit_batch_device_dispatch(state, data, config, max_iter,
                                  check_every), max_iter)


def fit_batch_converged(state, data, config, max_iter, segment=10):
    """Fit until every blend in the batch converges (or ``max_iter``),
    checking between compiled ``segment``-iteration scans.

    Converged blends freeze through the ``active`` mask either way; this
    just stops paying for iterations once the whole batch is done —
    the batched analog of the reference's per-blend e_rel stop.
    Returns (final_state, losses (<=max_iter, B)).
    """
    # defensive copy so donating the segment inputs never invalidates the
    # caller's state buffers
    state = jax.tree.map(
        lambda x: None if x is None else jnp.copy(x), state,
        is_leaf=lambda x: x is None)
    losses = []
    done = 0
    while done < max_iter:
        n = min(segment, max_iter - done)
        state, seg_losses = _fit_batch_donating(state, data, config, n)
        losses.append(seg_losses)
        done += n
        if not bool(jnp.any(state.active)):
            break
    return state, jnp.concatenate(losses, axis=0)


def fit_batch_sharded(state, data, config, n_iter, mesh, shard_bands=False):
    """Run the batched fit under ``shard_map`` over a ("blends", "bands")
    mesh with explicit collectives.

    The blends axis is pure data parallelism.  With ``shard_bands`` each
    device additionally holds C/bands channels (model parallelism): the
    engine psums the cross-band reductions (logL, morphology gradients,
    SED means, threshold cuts) over the "bands" axis, and the per-shard
    FFT convolution operates on plain local arrays — channels are batch
    dims of the 2D FFT, so no cross-device traffic rides the transform
    (and it runs even on backends whose FFT runtime rejects GSPMD-sharded
    layouts, e.g. CPU).

    Returns (final_state, losses (n_iter, B)).
    """
    try:
        from jax import shard_map
    except ImportError:                             # older jax
        from jax.experimental.shard_map import shard_map

    bands = mesh.shape.get("bands", 1)
    use_bands = bool(shard_bands) and bands > 1
    local_cfg = config
    if use_bands:
        C, H, W = config.scene_shape
        if C % bands != 0:
            raise ValueError(
                f"channel count {C} not divisible by bands={bands}")
        local_cfg = dataclasses.replace(
            config, scene_shape=(C // bands, H, W), band_axis="bands",
            n_bands_total=C)

    band = "bands" if use_bands else None
    chan_spec = {
        "images": P("blends", band),
        "weights": P("blends", band),
        "kernel_rfft": P("blends", None, band),
        "grad_kernel_rfft": P("blends", None, band),
        "bg_rms": P("blends", band),
        "sed_step_min": P("blends", band),
        "fista_step": P("blends"),
        "box_masks": P("blends"),
        "scene_mask": P("blends"),
    }
    data_specs = engine.BlendData(**{
        name: None if getattr(data, name) is None else (
            P() if name in _SHARED_FIELDS else chan_spec[name])
        for name in data._fields
    })

    sed_opt_spec = jax.tree.map(
        lambda x: P("blends", None, band) if x.ndim == 3 else P("blends"),
        state.sed_opt)
    state_specs = engine.BlendState(
        seds=P("blends", None, band),
        morphs=P("blends"),
        origins=P("blends"),
        comp_active=P("blends"),
        sed_opt=sed_opt_spec,
        morph_opt=jax.tree.map(lambda x: P("blends"), state.morph_opt),
        active=P("blends"),
        it=P("blends"),
        last_loss=P("blends"),
        box_half=None if state.box_half is None else jax.tree.map(
            lambda x: P("blends"), state.box_half),
        step_scale=None if state.step_scale is None else jax.tree.map(
            lambda x: P("blends"), state.step_scale),
    )

    def body(s, d):
        return _fit_batch(s, d, local_cfg, n_iter)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(state_specs, data_specs),
                   out_specs=(state_specs, P(None, "blends")),
                   check_vma=False)
    return jax.jit(fn)(state, data)


def make_mesh(n_devices=None, bands=1, devices=None):
    """Build a ("blends", "bands") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices]).reshape(n_devices // bands,
                                                      bands)
    return Mesh(devices, ("blends", "bands"))


def shard_batch(data, state, mesh):
    """Place batch pytrees on the mesh for the GSPMD path: the batch
    (leading) axis of every leaf shards over "blends"; the shared
    monotonicity tables replicate.  Band-axis model parallelism uses
    :func:`fit_batch_sharded` (explicit shard_map collectives) instead —
    GSPMD channel sharding would route non-default layouts into backend
    FFT runtimes that reject them."""
    def put(x, batched=True):
        if x is None:
            return None
        parts = [None] * x.ndim
        if batched:
            parts[0] = "blends"
        return jax.device_put(x, NamedSharding(mesh, P(*parts)))

    def put_tree(t, batched=True):
        return jax.tree.map(lambda x: put(x, batched), t,
                            is_leaf=lambda x: x is None)

    data = engine.BlendData(**{
        name: put_tree(getattr(data, name),
                       batched=name not in _SHARED_FIELDS)
        for name in data._fields
    })
    state = put_tree(state)
    return data, state
