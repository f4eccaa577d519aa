"""Parameter priors: log-likelihood terms added to the fit objective.

Ref: scarlet/prior.py:1-19 (abstract only; the reference ships no concrete
priors).  ``grad`` is optional here — when omitted it is derived with
``jax.grad`` of ``__call__``.
"""
from __future__ import annotations

import jax

__all__ = ["Prior"]


class Prior:
    """Prior base class: ``__call__(*X)`` returns the log-likelihood."""

    def __call__(self, *X):
        raise NotImplementedError

    def grad(self, *X):
        """Gradient of the prior log-likelihood; autodiff fallback."""
        g = jax.grad(self.__call__, argnums=tuple(range(len(X))))(*X)
        return g[0] if len(X) == 1 else g
