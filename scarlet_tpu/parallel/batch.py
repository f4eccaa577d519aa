"""Batched deblending: thousands of blends per chip, sharded over a mesh.

``engine.fit_step`` is written per-blend with an ``active`` convergence mask,
so batching is exactly one ``vmap``: every blend in the batch stops updating
independently while the scan keeps running.  Multi-chip scaling shards the
batch ("blends") axis — and optionally the band axis — with
``jax.sharding.NamedSharding``; blends are independent, so the only
cross-device traffic XLA inserts is for the optional band axis
(psum of per-band gradient contractions).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lite import engine

__all__ = [
    "BatchConfig",
    "pack_batch",
    "replicate_blend",
    "fit_batch",
    "make_mesh",
    "shard_batch",
]

BatchConfig = engine.LiteFitConfig


def _stack(pytrees):
    """Stack a list of identically-structured pytrees along a new leading
    axis (None leaves must agree)."""
    return jax.tree.map(
        lambda *xs: None if xs[0] is None else jnp.stack(xs), *pytrees,
        is_leaf=lambda x: x is None,
    )


def pack_batch(blend_setups):
    """Stack per-blend (data, state) pairs into batch pytrees.

    All blends must share the same static config (scene shape, K, box size);
    pad component slots with ``comp_active=False`` to equalize K.
    """
    datas, states = zip(*blend_setups)
    return _stack(datas), _stack(states)


def replicate_blend(data, state, batch):
    """Tile one blend's (data, state) ``batch`` times (benchmarking)."""
    rep = lambda x: None if x is None else jnp.broadcast_to(  # noqa: E731
        x[None], (batch,) + x.shape)
    return (
        jax.tree.map(rep, data, is_leaf=lambda x: x is None),
        jax.tree.map(rep, state, is_leaf=lambda x: x is None),
    )


def _fit_batch(state, data, config, n_iter):
    def body(s, _):
        s2, logL = jax.vmap(lambda st, dt: engine.fit_step(st, dt, config))(
            s, data)
        return s2, logL

    return jax.lax.scan(body, state, None, length=n_iter)


fit_batch = partial(jax.jit, static_argnames=("config", "n_iter"))(_fit_batch)

# Segment-loop variant: the input state buffers are donated so XLA aliases
# them with the output state (no fresh ~state-size allocation per segment).
_fit_batch_donating = partial(
    jax.jit, static_argnames=("config", "n_iter"), donate_argnums=(0,)
)(_fit_batch)


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


def make_mesh(n_devices=None, bands=1, devices=None):
    """Build a ("blends", "bands") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices]).reshape(n_devices // bands,
                                                      bands)
    return Mesh(devices, ("blends", "bands"))


def shard_batch(data, state, mesh, shard_bands=False):
    """Place batch pytrees on the mesh: the batch (leading) axis of every
    leaf shards over "blends"; with ``shard_bands`` the channel axis of the
    image/kernel leaves additionally splits over "bands" (model
    parallelism — note XLA's CPU FFT rejects sharded-channel layouts, so
    keep this off for CPU validation runs)."""
    chan_axes = {"images": 1, "weights": 1, "kernel_rfft": 2,
                 "grad_kernel_rfft": 2, "bg_rms": 1, "sed_step_min": 1}

    def put(x, chan_axis=None):
        if x is None:
            return None
        parts = [None] * x.ndim
        parts[0] = "blends"
        if shard_bands and chan_axis is not None and x.ndim > chan_axis and \
                mesh.shape["bands"] > 1:
            parts[chan_axis] = "bands"
        return jax.device_put(x, NamedSharding(mesh, P(*parts)))

    def put_tree(t, chan_axis=None):
        return jax.tree.map(lambda x: put(x, chan_axis), t,
                            is_leaf=lambda x: x is None)

    data = engine.BlendData(**{
        name: put_tree(getattr(data, name), chan_axes.get(name))
        for name in data._fields
    })
    state = put_tree(state)
    return data, state
