"""Constraints: proximal operators attached to parameters.

Every constraint is a pure function ``f(X, step) -> X'`` built on
``scarlet_tpu.ops.prox``; all default paths are jit/vmap-compatible so they
can run inside the compiled fit loop.  Behavioral reference:
scarlet/constraint.py (file:line cited per class).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import prox as prox_ops
from ..cache import Cache

__all__ = [
    "Constraint",
    "ConstraintChain",
    "PositivityConstraint",
    "NormalizationConstraint",
    "L0Constraint",
    "L1Constraint",
    "ThresholdConstraint",
    "MonotonicityConstraint",
    "MonotonicMaskConstraint",
    "SymmetryConstraint",
    "CenterOnConstraint",
    "LeakyConstraint",
]


class Constraint:
    """Prox wrapper with signature ``f(X, step) -> X'``.

    Ref: scarlet/constraint.py:10-55.
    """

    def __init__(self, f=None):
        self.f = f

    def __call__(self, X, step):
        if self.f is not None:
            return self.f(X, step)
        return X


class ConstraintChain:
    """Alternating projections over a list of constraints.

    Ref: scarlet/constraint.py:58-80.
    """

    def __init__(self, *constraints, repeat=1):
        assert isinstance(repeat, int) and repeat >= 1
        self.constraints = constraints
        self.repeat = repeat

    def __call__(self, X, step):
        for _ in range(self.repeat):
            for c in self.constraints:
                X = c(X, step)
        return X


class PositivityConstraint(Constraint):
    """X >= zero. Ref: constraint.py:83-92."""

    def __init__(self, zero=0):
        self.zero = zero

    def __call__(self, X, step):
        return jnp.maximum(X, self.zero)


class NormalizationConstraint(Constraint):
    """Normalize sum or max to unity. Ref: constraint.py:95-114."""

    def __init__(self, type="sum"):
        type = type.lower()
        assert type in ("sum", "max")
        self.type = type

    def __call__(self, X, step):
        if self.type == "sum":
            return X / jnp.sum(X)
        return X / jnp.max(X)


class L0Constraint(Constraint):
    """Hard thresholding. Ref: constraint.py:117-131."""

    def __init__(self, thresh, type="absolute"):
        self.thresh = thresh
        self.type = type

    def __call__(self, X, step):
        return prox_ops.prox_hard(X, step, thresh=self.thresh, type=self.type)


class L1Constraint(Constraint):
    """Soft thresholding. Ref: constraint.py:134-145."""

    def __init__(self, thresh, type="absolute"):
        self.thresh = thresh
        self.type = type

    def __call__(self, X, step):
        return prox_ops.prox_soft(X, step, thresh=self.thresh, type=self.type)


class ThresholdConstraint(Constraint):
    """Cut pixels below a log-histogram noise threshold.

    Ref: constraint.py:148-180.  The jit path computes the dynamic-bin
    histogram arithmetically (see ops.prox.prox_threshold).
    """

    def __call__(self, X, step):
        return prox_ops.prox_threshold(X, step)

    def threshold(self, morph):
        """Host-side exact threshold, mirroring constraint.py:165-180."""
        return prox_ops.threshold(morph)


class MonotonicityConstraint(Constraint):
    """Radially monotonic morphology. Ref: constraint.py:183-234.

    ``fit_center_radius > 0`` searches a window around the box center for
    the true peak; under jit this selects between precomputed weight stacks
    with ``lax.switch`` so the center stays data-dependent without dynamic
    shapes.
    """

    def __init__(self, neighbor_weight="flat", min_gradient=0.1, use_mask=False,
                 fit_center_radius=0):
        self.neighbor_weight = neighbor_weight
        self.min_gradient = min_gradient
        self.use_mask = use_mask
        self.fit_center = fit_center_radius > 0
        self.fit_center_radius = int(fit_center_radius)

    def _prox_for_center(self, shape, center):
        return prox_ops.build_prox_monotonic(
            shape,
            neighbor_weight=self.neighbor_weight,
            min_gradient=self.min_gradient,
            center=center,
        )

    def __call__(self, morph, step):
        shape = morph.shape
        center = (shape[0] // 2, shape[1] // 2)

        if self.fit_center:
            result = self._call_fit_center(morph, step, shape, center)
        else:
            result = self._prox_for_center(shape, center)(morph, step)

        if self.use_mask:
            # Host-side hybrid (init-time only): overwrite the path-monotonic
            # region with the flood-fill mask model.  Ref: constraint.py:228-233.
            morph_host = np.asarray(morph)
            valid, _morph, _bounds = prox_ops.prox_monotonic_mask(
                morph_host, step, center=center, center_radius=0, variance=0,
                max_iter=0,
            )
            result = jnp.where(jnp.asarray(valid), jnp.asarray(_morph), result)
        return result

    def _call_fit_center(self, morph, step, shape, center):
        """Data-dependent center via lax.switch over candidate centers."""
        r = self.fit_center_radius
        cy, cx = center
        H, W = shape
        candidates = []
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                y = min(max(cy + dy, 0), H - 1)
                x = min(max(cx + dx, 0), W - 1)
                candidates.append((y, x))

        key = ("fit_center", tuple(shape), tuple(center), r,
               self.neighbor_weight, float(self.min_gradient))
        try:
            branches = Cache.check("monotonic_fit_center", key)
        except KeyError:
            branches = [self._prox_for_center(shape, c) for c in candidates]
            Cache.set("monotonic_fit_center", key, branches)

        # peak search in the (2r+1)^2 window around the center
        y0, x0 = max(cy - r, 0), max(cx - r, 0)
        window = jax.lax.dynamic_slice(
            morph, (y0, x0),
            (min(2 * r + 1, H - y0), min(2 * r + 1, W - x0)),
        )
        flat_idx = jnp.argmax(window)
        wy, wx = jnp.unravel_index(flat_idx, window.shape)
        py, px = wy + y0, wx + x0
        # map (py, px) to candidate index
        idx = (jnp.clip(py - cy + r, 0, 2 * r) * (2 * r + 1)
               + jnp.clip(px - cx + r, 0, 2 * r))
        fns = [lambda m, p=p: p(m, step) for p in branches]
        return jax.lax.switch(idx, fns, morph)


class MonotonicMaskConstraint(Constraint):
    """Flood-fill monotonicity from the center (host-side).

    Ref: constraint.py:237-259.
    """

    def __init__(self, center, center_radius=1, variance=0.0, max_iter=3):
        self.center = center
        self.center_radius = center_radius
        self.variance = variance
        self.max_iter = max_iter

    def _prox(self, morph, step):
        return prox_ops.prox_monotonic_mask(
            np.asarray(morph), step, center=self.center,
            center_radius=self.center_radius, variance=self.variance,
            max_iter=self.max_iter,
        )

    def __call__(self, morph, step):
        if morph.ndim == 2:
            _, model, _ = self._prox(morph, step)
            return jnp.asarray(model)
        return jnp.asarray(
            np.array([self._prox(m, step)[1] for m in np.asarray(morph)])
        )


class SymmetryConstraint(Constraint):
    """Soft symmetry about the box center. Ref: constraint.py:262-273."""

    def __init__(self, strength=1):
        self.strength = strength

    def __call__(self, morph, step):
        return prox_ops.prox_soft_symmetry(morph, step, strength=self.strength)


class CenterOnConstraint(Constraint):
    """Keep the center pixel above ``tiny``. Ref: constraint.py:276-287."""

    def __init__(self, tiny=1e-6):
        self.tiny = tiny

    def __call__(self, morph, step):
        center = (morph.shape[0] // 2, morph.shape[1] // 2)
        return morph.at[center].set(jnp.maximum(morph[center], self.tiny))


class LeakyConstraint(Constraint):
    """Blend prox output with the input. Ref: constraint.py:290-301."""

    def __init__(self, constraint, leak=0.05):
        self.constraint = constraint
        self.leak = leak

    def __call__(self, x, step):
        return (1 - self.leak) * self.constraint(x, step) + self.leak * x
