"""Proximal first-order optimizers (adaprox / FISTA), pure-functional.

This module internalizes the behavior of the external ``proxmin`` package the
reference depends on (SURVEY.md appendix): the adaptive-moment ``phi/psi``
update rules {adam, nadam, amsgrad, padam, adamx, radam} and the proximal
sub-iteration scheme of ``proxmin.adaprox`` / lite ``AdaproxParameter``
(scarlet/lite/parameters.py:159-305), reimplemented from the published
algorithms (Kingma & Ba 2015; Dozat 2016; Reddi, Kale & Kumar 2018;
Chen & Gu 2018; Phuong & Phong 2019; Liu et al. 2019; Melchior et al. 2019
"Proximal Adam") as pure ``jnp`` functions suitable for ``lax.scan`` loops
and ``vmap`` batching.

State is a per-parameter pytree ``AdaproxState(m, v, vhat)``; every update is
``(x, state) -> (x', state')`` with no in-place mutation, so a whole blend's
fit step jit-compiles into a single XLA program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "AdaproxState",
    "FistaState",
    "init_adaprox_state",
    "init_fista_state",
    "phi_psi",
    "adaprox_step",
    "fista_step",
    "SCHEMES",
]

SCHEMES = ("adam", "nadam", "amsgrad", "padam", "adamx", "radam")


class AdaproxState(NamedTuple):
    m: jnp.ndarray      # first moment
    v: jnp.ndarray      # second moment
    vhat: jnp.ndarray   # running max of the second moment


class FistaState(NamedTuple):
    z: jnp.ndarray      # extrapolation point
    t: jnp.ndarray      # acceleration scalar


def init_adaprox_state(x, m=None, v=None, vhat=None):
    """Zero (or warm-start) moments for ``x``.

    ``vhat`` starts at 0 — equivalent to the reference's ``-inf`` start
    (lite/parameters.py:268) since ``vhat = max(vhat, v)`` and ``v >= 0``.
    """
    zeros = jnp.zeros_like(x)
    return AdaproxState(
        m=zeros if m is None else jnp.asarray(m),
        v=zeros if v is None else jnp.asarray(v),
        vhat=zeros if vhat is None else jnp.maximum(jnp.asarray(vhat), 0.0),
    )


def init_fista_state(x, z=None, t=1.0):
    return FistaState(
        z=jnp.asarray(x) if z is None else jnp.asarray(z),
        t=jnp.asarray(t, dtype=x.dtype),
    )


def phi_psi(scheme, it, g, state, b1=0.9, b2=0.999, eps=1e-8, p=0.25):
    """Adaptive-moment numerator/denominator for the update
    ``x <- x - step * phi / psi``.

    ``it`` is the 0-based (traced) iteration.  Returns
    ``(phi, psi, new_state)``.
    """
    assert scheme in SCHEMES, f"unknown scheme {scheme}"
    m = (1 - b1) * g + b1 * state.m
    v = (1 - b2) * (g * g) + b2 * state.v
    t = it + 1.0

    bias1 = 1 - b1 ** t
    bias2 = 1 - b2 ** t

    if scheme == "adam":
        phi = m / bias1
        psi = jnp.sqrt(v / bias2) + eps
        vhat = state.vhat
    elif scheme == "nadam":
        # Dozat 2016: Nesterov momentum folded into the bias correction
        phi = (b1 * m + (1 - b1) * g) / bias1
        psi = jnp.sqrt(v / bias2) + eps
        vhat = state.vhat
    elif scheme == "amsgrad":
        # Reddi, Kale & Kumar 2018: running max of v, no bias correction
        vhat = jnp.maximum(state.vhat, v)
        phi = m
        psi = jnp.sqrt(vhat) + eps
    elif scheme == "padam":
        # Chen & Gu 2018: partially adaptive exponent p
        vhat = jnp.maximum(state.vhat, v)
        phi = m
        psi = vhat ** p + eps
    elif scheme == "adamx":
        # Phuong & Phong 2019: decay the running max by the momentum ratio.
        # The guard keeps the it==0 branch finite: its denominator
        # (1-b1^0)^2 == 0 would otherwise divide by zero eagerly for plain
        # python scalars (and ride through as a masked inf when traced).
        denom = jnp.maximum((1 - b1 ** (jnp.asarray(t) - 1)) ** 2, eps)
        factor = jnp.where(it > 0, (1 - b1 ** t) ** 2 / denom, 1.0)
        vhat = jnp.maximum(factor * state.vhat, v)
        phi = m
        psi = jnp.sqrt(vhat) + eps
    else:  # radam
        # Liu et al. 2019: variance rectification
        rho_inf = 2.0 / (1 - b2) - 1
        rho = rho_inf - 2 * t * (b2 ** t) / bias2
        mhat = m / bias1
        r = jnp.sqrt(
            jnp.clip(
                ((rho - 4) * (rho - 2) * rho_inf)
                / jnp.maximum((rho_inf - 4) * (rho_inf - 2) * rho, eps),
                0.0,
            )
        )
        use_adaptive = rho > 4
        phi = jnp.where(use_adaptive, r * mhat, mhat)
        psi = jnp.where(use_adaptive, jnp.sqrt(v / bias2) + eps,
                        jnp.ones_like(v))
        vhat = state.vhat

    return phi, psi, AdaproxState(m=m, v=v, vhat=vhat)


def adaprox_step(x, g, it, state, step, prox=None, scheme="amsgrad",
                 b1=0.9, b2=0.999, eps=1e-8, p=0.25, max_prox_iter=1,
                 prox_e_rel=1e-6, active=None):
    """One proximal-Adam parameter update.

    Mirrors lite ``AdaproxParameter.update`` (lite/parameters.py:274-305):
    moment update -> ``x -= step*phi/psi`` (damped 10x at it==0) -> PGM
    sub-iterations of the prox with step ``gamma = step / max(psi)``.

    ``active`` (optional bool scalar) freezes the update for converged
    blends under vmap batching without branching.
    """
    phi, psi, new_state = phi_psi(scheme, it, g, state, b1, b2, eps, p)

    damp = jnp.where(it > 0, 1.0, 0.1)
    x_new = x - damp * step * phi / psi

    if prox is not None:
        gamma = step / jnp.max(psi)

        if max_prox_iter <= 1:
            # z = x initially makes the first PGM argument exactly x.
            x_new = prox(x_new, gamma)
        else:
            def body(tau, z):
                return prox(z - gamma / step * psi * (z - x_new), gamma)
            x_new = jax.lax.fori_loop(0, max_prox_iter, body, x_new)

    if active is not None:
        x_new = jnp.where(active, x_new, x)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(active, new, old), new_state, state
        )
    return x_new, new_state


def fista_step(x, g, it, state, step, prox=None, active=None):
    """One FISTA (Beck & Teboulle 2009) accelerated PGM update.

    Mirrors lite ``FistaParameter.update`` (lite/parameters.py:91-156).
    """
    y = state.z - step * g
    x_new = prox(y, step) if prox is not None else y
    t_new = 0.5 * (1 + jnp.sqrt(1 + 4 * state.t ** 2))
    omega = 1 + (state.t - 1) / t_new
    z_new = x + omega * (x_new - x)

    if active is not None:
        x_new = jnp.where(active, x_new, x)
        z_new = jnp.where(active, z_new, state.z)
        t_new = jnp.where(active, t_new, state.t)
    return x_new, FistaState(z=z_new, t=t_new)
