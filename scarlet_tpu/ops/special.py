"""Special functions missing from jax.scipy.

``kv`` — the modified Bessel function of the second kind of real order —
is needed by the Spergel (2010) galaxy profile (scarlet/morphology.py:380-381
imports it from scipy and autograd-wraps it).  Here it is computed on-device
from the integral representation

    K_nu(x) = \\int_0^inf exp(-x cosh t) cosh(nu t) dt        (x > 0)

with fixed-order Gauss-Legendre quadrature after the substitution
``t = s / (1 - s)`` mapping [0, inf) -> [0, 1).  For the Spergel parameter
ranges (|nu| <= 4, x >= ~1e-2) 256 nodes give ~1e-10 relative accuracy
(validated against scipy in tests/test_special.py).

Differentiation: d/dx K_nu(x) = -(K_{nu-1}(x) + K_{nu+1}(x)) / 2 via
``jax.custom_jvp``; the derivative wrt ``nu`` is defined as zero, matching
the reference's autograd registration (defvjp(kv, None, ...)).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["kv"]

_N_NODES = 256
_nodes, _weights = np.polynomial.legendre.leggauss(_N_NODES)
# map [-1, 1] -> [0, 1)
_s = 0.5 * (_nodes + 1.0)
_w = 0.5 * _weights
# substitution t = s/(1-s): dt = ds / (1-s)^2
_t = _s / (1.0 - _s)
_jac = 1.0 / (1.0 - _s) ** 2
# the node tables stay HOST numpy at import: a module-level jnp.asarray
# would initialize the JAX backend at `import scarlet_tpu` time, which
# hangs any process when the pinned accelerator is unreachable and
# defeats later jax_platforms pins (conversion below is per-call but the
# tables are 256 floats; under jit they fold into compile-time constants)
_T = _t
_WJ = _w * _jac
# clip cosh to the float64 max: nodes near s=1 have cosh overflow to inf and
# would turn exp(-x*inf) into nan via inf*0 paths; the clipped tail still
# underflows exp to exactly 0
with np.errstate(over="ignore"):
    _COSH_T = np.minimum(np.cosh(_t), 1e300)


def _kv_primal(nu, x):
    """Quadrature evaluation; broadcasts over ``x`` of any shape."""
    x = jnp.asarray(x)
    shape = x.shape
    xf = x.reshape(-1, 1)
    # exp(nu*t - x*cosh t) + exp(-nu*t - x*cosh t) over nodes
    expo = -xf * _COSH_T[None, :]
    integrand = 0.5 * (jnp.exp(expo + nu * _T[None, :])
                       + jnp.exp(expo - nu * _T[None, :]))
    out = jnp.sum(integrand * _WJ[None, :], axis=-1)
    return out.reshape(shape)


@partial(jax.custom_jvp, nondiff_argnums=())
def kv(nu, x):
    """Modified Bessel function of the second kind K_nu(x), x > 0."""
    return _kv_primal(nu, x)


@kv.defjvp
def _kv_jvp(primals, tangents):
    nu, x = primals
    _, x_dot = tangents
    primal_out = _kv_primal(nu, x)
    # dK/dx = -(K_{nu-1} + K_{nu+1})/2 ; dK/dnu treated as zero (parity with
    # the reference's partial gradient).
    dkdx = -(_kv_primal(nu - 1, x) + _kv_primal(nu + 1, x)) / 2.0
    return primal_out, dkdx * x_dot
