"""Checkpoint / resume.

The reference checkpoints by pickling the model objects, with warm Adam
moments carried on the parameters (scarlet/parameter.py:86-97,
blend.py:152-163) — pickling works the same here (Parameters and
LiteParameters serialize their arrays + moments).

This module adds the batched-engine equivalent (SURVEY.md §5.4): the whole
fit state — (seds, morphs, origins, optimizer moments, convergence flags) —
is a pytree with device arrays converted to host numpy, saved alongside the
static config, so a fleet of blends can stop and resume exactly, including
mid-fit warm restarts on a different host or device topology.
"""
from __future__ import annotations

import pathlib
import pickle

import numpy as np
import jax

__all__ = ["save_fit_state", "load_fit_state"]


def _to_host(tree):
    return jax.tree.map(
        lambda x: None if x is None else np.asarray(x), tree,
        is_leaf=lambda x: x is None)


def _to_device(tree):
    return jax.tree.map(
        lambda x: None if x is None else jax.numpy.asarray(x), tree,
        is_leaf=lambda x: x is None)


def save_fit_state(path, config, state, data=None):
    """Save (config, state[, data]) to ``<path>.ckpt``; returns the path."""
    path = pathlib.Path(path).with_suffix(".ckpt")
    payload = {
        "version": 1,
        "config": config,
        "state": _to_host(state),
        "data": _to_host(data) if data is not None else None,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return path


def load_fit_state(path):
    """Load (config, state, data-or-None) saved by :func:`save_fit_state`."""
    path = pathlib.Path(path).with_suffix(".ckpt")
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = _to_device(payload["state"])
    data = _to_device(payload["data"]) if payload["data"] is not None else None
    return payload["config"], state, data
