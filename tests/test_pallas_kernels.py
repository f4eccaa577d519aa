"""Pallas kernel correctness (interpret mode on CPU): the VMEM-resident
monotonicity projection must match the XLA Jacobi formulation exactly."""
import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from scarlet_tpu.ops import prox as prox_ops
from scarlet_tpu.lite import engine
from scarlet_tpu.ops.pallas_kernels import batched_monotonic_prox


def test_batched_monotonic_matches_reference():
    rng = np.random.RandomState(7)
    box = (21, 21)
    K = 5
    weights, keeps, n_iter = engine.monotonicity_tables(
        box, fit_center_radius=1, neighbor_weight="angle")
    morphs = rng.rand(K, *box).astype(np.float32) * 10
    idx = rng.randint(0, weights.shape[0], size=(K,)).astype(np.int32)

    got = np.asarray(batched_monotonic_prox(
        jnp.asarray(morphs), jnp.asarray(idx),
        jnp.asarray(weights.astype(np.float32)), jnp.asarray(keeps),
        n_iter, min_gradient=0.0, interpret=True))

    # reference: per-slice sequential-equivalent Jacobi
    for k in range(K):
        ncand = weights.shape[0]
        w = weights[idx[k]]
        r = 1
        cy = 10 + (idx[k] // (2 * r + 1)) - r
        cx = 10 + (idx[k] % (2 * r + 1)) - r
        expected = np.asarray(prox_ops.prox_weighted_monotonic(
            jnp.asarray(morphs[k], jnp.float32),
            jnp.asarray(w.astype(np.float32)), n_iter,
            min_gradient=0.0, center=(cy, cx)))
        assert_allclose(got[k], expected, rtol=1e-6, atol=1e-6)


def test_engine_pallas_interpret_matches_xla():
    """Whole fit step with use_pallas(+interpret) equals the XLA path."""
    import dataclasses
    import __graft_entry__ as g

    config, data, state = g._demo_setup()
    out_x, loss_x = engine.fit_scan(state, data, config, 5)
    config_p = dataclasses.replace(config, use_pallas=True,
                                   pallas_interpret=True)
    out_p, loss_p = engine.fit_scan(state, data, config_p, 5)
    assert_allclose(np.asarray(loss_p), np.asarray(loss_x), rtol=1e-5)
    assert_allclose(np.asarray(out_p.morphs), np.asarray(out_x.morphs),
                    rtol=1e-5, atol=1e-6)
