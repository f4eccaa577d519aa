"""Checkpoint / resume.

The reference checkpoints by pickling the model objects, with warm Adam
moments carried on the parameters (scarlet/parameter.py:86-97,
blend.py:152-163) — pickling works the same here (Parameters and
LiteParameters serialize their arrays + moments).

This module adds the batched-engine equivalent (SURVEY.md §5.4): the whole
fit state — (seds, morphs, origins, optimizer moments, convergence flags) —
is a pytree saved as one npz with the static config as JSON, so a fleet of
blends can stop and resume exactly, including mid-fit warm restarts on a
different host or device topology.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np
import jax

from .lite.engine import BlendState, BlendData, LiteFitConfig
from .optim import AdaproxState, FistaState

__all__ = ["save_fit_state", "load_fit_state"]


def _flatten_named(tree, prefix):
    leaves = {}

    def walk(node, path):
        if node is None:
            leaves[path + ".__none__"] = np.zeros(0)
        elif isinstance(node, (BlendState, BlendData, AdaproxState,
                               FistaState)):
            for name, val in node._asdict().items():
                walk(val, f"{path}.{name}")
        else:
            leaves[path] = np.asarray(node)
    walk(tree, prefix)
    return leaves


def save_fit_state(path, config, state, data=None):
    """Save (config, state[, data]) to ``<path>.npz`` + ``<path>.json``."""
    path = pathlib.Path(path)
    arrays = _flatten_named(state, "state")
    if data is not None:
        arrays.update(_flatten_named(data, "data"))
    np.savez_compressed(path.with_suffix(".npz"), **arrays)

    cfg = dataclasses.asdict(config)
    meta = {
        "config": cfg,
        "opt_state_type": type(state.sed_opt).__name__,
        "has_data": data is not None,
    }
    path.with_suffix(".json").write_text(json.dumps(meta, indent=1,
                                                    default=str))
    return path.with_suffix(".npz")


def _rebuild(cls, arrays, prefix, as_jax=True):
    kwargs = {}
    for name in cls._fields:
        key = f"{prefix}.{name}"
        none_key = key + ".__none__"
        if none_key in arrays:
            kwargs[name] = None
        elif key in arrays:
            val = arrays[key]
            kwargs[name] = jax.numpy.asarray(val) if as_jax else val
        else:
            # nested opt-state: try both types
            sub_keys = [k for k in arrays if k.startswith(key + ".")]
            fields = {k.rsplit(".", 1)[-1] for k in sub_keys}
            sub_cls = AdaproxState if "m" in fields else FistaState
            kwargs[name] = _rebuild(sub_cls, arrays, key, as_jax)
    return cls(**kwargs)


def load_fit_state(path):
    """Load (config, state, data-or-None) saved by :func:`save_fit_state`."""
    path = pathlib.Path(path)
    meta = json.loads(path.with_suffix(".json").read_text())
    arrays = dict(np.load(path.with_suffix(".npz")))

    cfg_dict = meta["config"]
    # JSON turns tuples into lists; restore the static fields
    for key in ("scene_shape", "box_shape", "fft_shape"):
        if cfg_dict.get(key) is not None:
            if isinstance(cfg_dict[key], str):
                cfg_dict[key] = eval(cfg_dict[key])  # noqa: S307 ("(1, 2)")
            cfg_dict[key] = tuple(cfg_dict[key])
    if cfg_dict.get("bg_thresh") in ("None", None):
        cfg_dict["bg_thresh"] = None
    else:
        cfg_dict["bg_thresh"] = float(cfg_dict["bg_thresh"])
    for key, val in list(cfg_dict.items()):
        if isinstance(val, str):
            if val in ("True", "False"):
                cfg_dict[key] = val == "True"
    config = LiteFitConfig(**cfg_dict)

    state = _rebuild(BlendState, arrays, "state")
    data = _rebuild(BlendData, arrays, "data") if meta["has_data"] else None
    return config, state, data
