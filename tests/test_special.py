"""Validate the on-device Bessel K_nu quadrature against scipy.

The Spergel morphology (scarlet_tpu/models/morphology.py) needs K_nu(x) for
nu in roughly [-0.85, 4] (the Spergel index range the reference supports,
scarlet/morphology.py:384-473) and x from ~1e-2 out to tens (profile radii).
scipy.special.kv is the ground truth the reference itself wraps
(scarlet/morphology.py:380-381).
"""
import numpy as np
import scipy.special
import jax
import jax.numpy as jnp
import pytest

from scarlet_tpu.ops.special import kv


NUS = [-0.85, -0.5, -0.3, 0.0, 0.3, 0.5, 1.0, 1.7, 2.5, 3.3, 4.0]


@pytest.mark.parametrize("nu", NUS)
def test_kv_matches_scipy(nu):
    x = np.concatenate([
        np.geomspace(1e-2, 1.0, 40),
        np.linspace(1.0, 50.0, 60),
    ])
    ours = np.asarray(kv(nu, jnp.asarray(x)))
    ref = scipy.special.kv(nu, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-8)


@pytest.mark.parametrize("nu", [-0.5, 0.0, 0.85, 2.0, 4.0])
def test_kv_jvp_matches_scipy_derivative(nu):
    # dK_nu/dx = -(K_{nu-1} + K_{nu+1})/2 (DLMF 10.29.2); scipy exposes it
    # as kvp. The JVP must match it, and the nu-tangent must be ignored
    # (parity with the reference's partial autograd registration,
    # scarlet/morphology.py:380-381: defvjp(kv, None, ...)).
    x = np.linspace(0.05, 20.0, 30)

    grad_fn = jax.vmap(jax.grad(lambda xi: kv(nu, xi)))
    ours = np.asarray(grad_fn(jnp.asarray(x)))
    ref = scipy.special.kvp(nu, x, n=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-7)

    # nu tangent defined as zero
    dnu = jax.grad(lambda n: kv(n, 1.5))(jnp.asarray(nu))
    assert float(dnu) == 0.0


def test_kv_broadcasts_and_is_finite_at_extremes():
    x = jnp.asarray(np.geomspace(1e-2, 50.0, 16).reshape(4, 4))
    out = np.asarray(kv(1.2, x))
    assert out.shape == (4, 4)
    assert np.all(np.isfinite(out))
    ref = scipy.special.kv(1.2, np.asarray(x))
    np.testing.assert_allclose(out, ref, rtol=1e-8)
