"""Optimization parameters.

Unlike the reference (which subclasses ``np.ndarray``, scarlet/parameter.py:9),
a :class:`Parameter` here is a light container around a ``jax.numpy`` array:
under ``jit`` the *values* flow through traced pytrees while the metadata
(name, constraint, step rule, fixed flag) stays static on the host object.
Adam moments ``m/v/vhat`` are stored on the parameter between fits so warm
restarts work exactly as in the reference (scarlet/blend.py:152-163).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["Parameter", "prepare_param", "relative_step"]


class Parameter:
    """A named, optionally constrained optimization parameter.

    Parameters
    ----------
    array: array-like
        Parameter values.
    name: str
    prior: `~scarlet_tpu.Prior` or None
    constraint: `~scarlet_tpu.Constraint` or None (a prox ``f(X, step)``)
    step: float or callable ``step(X, it) -> float``
    std: array-like or None — posterior error estimate, set after fitting
    m, v, vhat: array-like or None — Adam moments for warm restarts
    fixed: bool — exclude from optimization
    """

    def __init__(self, array, name="unnamed", prior=None, constraint=None,
                 step=0, std=None, m=None, v=None, vhat=None, fixed=False):
        self.value = jnp.asarray(array)
        self.name = name
        self.prior = prior
        self.constraint = constraint
        self.step = step
        self.std = std
        self.m = m
        self.v = v
        self.vhat = vhat
        self.fixed = fixed

    # -- array-like conveniences -----------------------------------------
    @property
    def shape(self):
        return self.value.shape

    @property
    def dtype(self):
        return self.value.dtype

    def __len__(self):
        return len(self.value)

    def __getitem__(self, i):
        return self.value[i]

    def __array__(self, dtype=None):
        arr = np.asarray(self.value)
        return arr.astype(dtype) if dtype is not None else arr

    def __jax_array__(self):
        return self.value

    def __repr__(self):
        return f"Parameter('{self.name}', shape={self.shape}, fixed={self.fixed})"

    @property
    def _data(self):
        return self.value

    @property
    def is_finite(self):
        # numpy, not jnp: this runs host-side between fit segments, and an
        # eager device op here costs a tunnel round trip per parameter on
        # a remote TPU (np.asarray on a device value is one fetch; values
        # are already host numpy between segments — Blend._sync)
        return bool(np.all(np.isfinite(np.asarray(self.value))))

    # -- state management -------------------------------------------------
    def set(self, value):
        """Replace the parameter values (shape may change on box resize)."""
        self.value = jnp.asarray(value)
        return self

    def step_size(self, it=0):
        """Evaluate the step rule at the current value and iteration."""
        if callable(self.step):
            return self.step(self.value, it)
        return self.step

    # -- pickling ----------------------------------------------------------
    def __getstate__(self):
        state = dict(self.__dict__)
        for key in ("value", "std", "m", "v", "vhat"):
            if state[key] is not None:
                state[key] = np.asarray(state[key])
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.value = jnp.asarray(self.value)


def prepare_param(X, name, fixed=True, step=None):
    """Wrap a scalar/array into a (fixed) Parameter. Ref: parameter.py:116-123."""
    if isinstance(X, Parameter):
        assert X.name == name
        return X
    if np.isscalar(X):
        X = (X,)
    return Parameter(jnp.asarray(np.array(X, dtype="float")), name=name,
                     fixed=fixed, step=step)


def relative_step(X, it, factor=0.1, minimum=0, axis=None):
    """Step size at ``factor`` times the mean of ``X``. Ref: parameter.py:126-129."""
    return jnp.maximum(minimum, factor * jnp.asarray(X).mean(axis=axis))
