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


def test_monotonic_tol_early_exit_close_to_exact():
    """tol > 0 (LiteFitConfig.mono_tol, opt-in) exits at max|delta| <= tol
    per 4-pass block — the result must stay within a few*tol of the exact
    fixed point, and tol=0 must stay bitwise-exact."""
    rng = np.random.RandomState(3)
    box = (21, 21)
    K = 6
    weights, keeps, n_iter = engine.monotonicity_tables(
        box, fit_center_radius=1, neighbor_weight="angle")
    morphs = rng.rand(K, *box).astype(np.float32)
    idx = rng.randint(0, weights.shape[0], size=(K,)).astype(np.int32)

    args = (jnp.asarray(morphs), jnp.asarray(idx),
            jnp.asarray(weights.astype(np.float32)), jnp.asarray(keeps),
            n_iter)
    exact = np.asarray(batched_monotonic_prox(*args, interpret=True))
    exact0 = np.asarray(batched_monotonic_prox(*args, interpret=True,
                                               tol=0.0))
    np.testing.assert_array_equal(exact, exact0)
    loose = np.asarray(batched_monotonic_prox(*args, interpret=True,
                                              tol=1e-3))
    # each pass is a min with a convex neighbor average: the residual
    # contracts per block, so the distance to the fixed point is of
    # order the exit tolerance
    assert np.max(np.abs(loose - exact)) < 5e-3
    # and the relaxed result is still a valid "less constrained" morph
    assert np.all(loose >= exact - 1e-6)


def test_monotonic_dynamic_tol_matches_static():
    """tol_arr (traced SMEM scalar, the iteration-scheduled tolerance)
    must equal the static-tol kernel at the same value, and be
    bitwise-exact at 0.0 — for both the grouped and the lane-packed
    entry points."""
    from scarlet_tpu.ops.pallas_kernels import monotonic_prox_packed

    rng = np.random.RandomState(3)
    box = (21, 21)
    K = 6
    weights, keeps, n_iter = engine.monotonicity_tables(
        box, fit_center_radius=1, neighbor_weight="angle")
    morphs = rng.rand(K, *box).astype(np.float32)
    idx = rng.randint(0, weights.shape[0], size=(K,)).astype(np.int32)
    args = (jnp.asarray(morphs), jnp.asarray(idx),
            jnp.asarray(weights.astype(np.float32)), jnp.asarray(keeps),
            n_iter)

    exact = np.asarray(batched_monotonic_prox(*args, interpret=True))
    dyn0 = np.asarray(batched_monotonic_prox(
        *args, interpret=True, tol_arr=jnp.asarray(0.0)))
    np.testing.assert_array_equal(exact, dyn0)
    loose_s = np.asarray(batched_monotonic_prox(*args, interpret=True,
                                                tol=1e-3))
    loose_d = np.asarray(batched_monotonic_prox(
        *args, interpret=True, tol_arr=jnp.asarray(1e-3)))
    np.testing.assert_array_equal(loose_s, loose_d)

    Hb, Wb = box
    packed = jnp.swapaxes(jnp.asarray(morphs), 0, 1).reshape(Hb, K * Wb)
    wtab = jnp.asarray(weights.astype(np.float32))
    pe = np.asarray(monotonic_prox_packed(
        packed, jnp.asarray(idx), wtab, jnp.asarray(keeps), Wb, n_iter,
        interpret=True))
    pd = np.asarray(monotonic_prox_packed(
        packed, jnp.asarray(idx), wtab, jnp.asarray(keeps), Wb, n_iter,
        interpret=True, tol_arr=jnp.asarray(0.0)))
    np.testing.assert_array_equal(pe, pd)


def test_engine_scheduled_mono_tol():
    """mono_tol_early/mono_tol_switch (iteration-scheduled tolerance):
    the scheduled fit must land at the static-tolerance solution, and the
    0/0 defaults must leave the program bitwise unchanged."""
    import dataclasses
    import __graft_entry__ as g

    config, data, state = g._demo_setup()
    for extra in ({}, {"packed_morphs": True, "use_pallas_scene": True}):
        cfg = dataclasses.replace(config, use_pallas=True,
                                  pallas_interpret=True, **extra)
        out_b, loss_b = engine.fit_scan(state, data, cfg, 20)
        out_d, loss_d = engine.fit_scan(state, data, dataclasses.replace(
            cfg, mono_tol_early=0.0, mono_tol_switch=0), 20)
        np.testing.assert_array_equal(np.asarray(loss_d),
                                      np.asarray(loss_b))
        cfg_s = dataclasses.replace(cfg, mono_tol=1e-3,
                                    mono_tol_early=1e-2, mono_tol_switch=8)
        out_s, loss_s = engine.fit_scan(state, data, cfg_s, 20)
        lb, ls = np.asarray(loss_b)[-1], np.asarray(loss_s)[-1]
        assert abs(ls - lb) / abs(lb) < 1e-4
        # convergence freezing was suppressed through the switch
        assert int(out_s.it) >= 8


def test_engine_mono_every():
    """mono_every=N (full projection every N-th iteration): the default 1
    must leave the traced tolerance off, skip iterations must get the
    huge tolerance (kernel exits after one pass block), and the fit must
    land near the exact-projection solution with every frozen blend
    stopping on a full-projection iteration."""
    import dataclasses
    import __graft_entry__ as g

    config, data, state = g._demo_setup()
    # traced-tol gating
    cfg2 = dataclasses.replace(config, mono_every=2)
    assert engine._mono_tol_arr(config, jnp.asarray(5)) is None
    arr = engine._mono_tol_arr(cfg2, jnp.asarray(4))
    assert float(arr) == cfg2.mono_tol
    assert float(engine._mono_tol_arr(cfg2, jnp.asarray(5))) == 1e6

    # a skip iteration's kernel == exactly one 4-pass Jacobi block
    rng = np.random.RandomState(7)
    box = (21, 21)
    K = 4
    weights, keeps, n_iter = engine.monotonicity_tables(
        box, fit_center_radius=1, neighbor_weight="angle")
    morphs = rng.rand(K, *box).astype(np.float32)
    idx = rng.randint(0, weights.shape[0], size=(K,)).astype(np.int32)
    skip = np.asarray(batched_monotonic_prox(
        jnp.asarray(morphs), jnp.asarray(idx),
        jnp.asarray(weights.astype(np.float32)), jnp.asarray(keeps),
        n_iter, interpret=True, tol_arr=jnp.asarray(1e6)))
    from scarlet_tpu.ops.arrays import shift_zero
    w = weights.astype(np.float32)[idx]
    keep = keeps[idx] > 0.5
    x = jnp.asarray(morphs)
    for _ in range(4):
        ref = jnp.zeros_like(x)
        for d, (dy, dx) in enumerate(prox_ops.NEIGHBOR_OFFSETS):
            ref = ref + w[:, d] * shift_zero(x, dy, dx)
        x = jnp.where(keep, jnp.asarray(morphs),
                      jnp.minimum(jnp.asarray(morphs), ref))
    # the kernel factorizes the neighbor sum by x-offset, so the
    # summation order differs from this reference at f32 roundoff
    assert_allclose(skip, np.asarray(x), rtol=1e-5, atol=1e-6)

    # whole fit: mono_every=2 lands near the exact solution
    for extra in ({}, {"packed_morphs": True, "use_pallas_scene": True}):
        cfg = dataclasses.replace(config, use_pallas=True,
                                  pallas_interpret=True, **extra)
        out_b, loss_b = engine.fit_scan(state, data, cfg, 20)
        out_e, loss_e = engine.fit_scan(
            state, data, dataclasses.replace(cfg, mono_every=2), 20)
        lb, le = np.asarray(loss_b)[-1], np.asarray(loss_e)[-1]
        assert abs(le - lb) / abs(lb) < 1e-2


def test_engine_pallas_interpret_matches_xla():
    """Whole fit step with use_pallas(+interpret) equals the XLA path."""
    import dataclasses
    import __graft_entry__ as g

    config, data, state = g._demo_setup()
    out_x, loss_x = engine.fit_scan(state, data, config, 5)
    config_p = dataclasses.replace(config, use_pallas=True,
                                   fuse_morph=True, pallas_interpret=True)
    out_p, loss_p = engine.fit_scan(state, data, config_p, 5)
    assert_allclose(np.asarray(loss_p), np.asarray(loss_x), rtol=1e-5)
    assert_allclose(np.asarray(out_p.morphs), np.asarray(out_x.morphs),
                    rtol=1e-5, atol=1e-6)


def _random_bucket(rng, C=5, H=58, W=48, K=10, hb=21, pad=8):
    seds = jnp.asarray(rng.uniform(0.1, 2, (K, C)).astype(np.float32))
    morphs = jnp.asarray(rng.uniform(0, 1, (K, hb, hb)).astype(np.float32))
    # origins anywhere in [-pad+1, dim - hb + pad - 1]: partially
    # out-of-scene boxes exercise the clipped-overlap padding
    oy = rng.integers(1 - pad, H - hb + pad, (K, 1))
    ox = rng.integers(1 - pad, W - hb + pad, (K, 1))
    origins = jnp.asarray(np.concatenate([oy, ox], 1).astype(np.int32))
    on = jnp.asarray(rng.uniform(size=K) > 0.2)
    return seds, morphs, origins, on


def test_scene_assembly_matches_xla():
    """VMEM roll-placement scene kernel == dynamic_update_slice loop."""
    import dataclasses
    from scarlet_tpu.lite.engine import LiteFitConfig, make_blend_state, \
        make_scene

    rng = np.random.default_rng(3)
    C, H, W, K, hb, pad = 5, 58, 48, 10, 21, 8
    cfg = LiteFitConfig(scene_shape=(C, H, W), box_shapes=((hb, hb),),
                        bucket_counts=(K,), fft_shape=None,
                        mono_n_iters=(14,), scene_pad=pad)
    seds, morphs, origins, on = _random_bucket(rng, C, H, W, K, hb, pad)
    state = make_blend_state(seds, morphs, origins, comp_active=on)
    ref = make_scene(state, cfg)
    got = make_scene(state, dataclasses.replace(
        cfg, use_pallas_scene=True, pallas_interpret=True))
    assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_grad_gather_matches_xla():
    """VMEM roll-gather gradient kernel == vmapped dynamic_slice einsums."""
    import jax
    from scarlet_tpu.ops.pallas_kernels import grad_gather

    rng = np.random.default_rng(4)
    C, H, W, K, hb, P = 5, 58, 48, 10, 21, 8
    seds, morphs, origins, _ = _random_bucket(rng, C, H, W, K, hb, P)
    gpad = jnp.pad(
        jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32)),
        ((0, 0), (P, P), (P, P)))
    gs, gm = grad_gather(gpad, seds, morphs, origins, P, interpret=True)

    zero = jnp.asarray(0, jnp.int32)

    def grads(origin, sed, morph):
        g = jax.lax.dynamic_slice(
            gpad, (zero, origin[0] + P, origin[1] + P), (C, hb, hb))
        return (jnp.einsum("chw,hw->c", g, morph),
                jnp.einsum("c,chw->hw", sed, g))

    gs_ref, gm_ref = jax.vmap(grads)(origins, seds, morphs)
    assert_allclose(np.asarray(gs), np.asarray(gs_ref), rtol=1e-4,
                    atol=1e-5)
    assert_allclose(np.asarray(gm), np.asarray(gm_ref), rtol=1e-4,
                    atol=1e-6)


def test_engine_pallas_scene_interpret_matches_xla():
    """Whole fit scan with the scene/grad kernels equals the XLA path."""
    import dataclasses
    import __graft_entry__ as g

    config, data, state = g._demo_setup()
    out_x, loss_x = engine.fit_scan(state, data, config, 5)
    config_p = dataclasses.replace(config, use_pallas_scene=True,
                                   pallas_interpret=True)
    out_p, loss_p = engine.fit_scan(state, data, config_p, 5)
    assert_allclose(np.asarray(loss_p), np.asarray(loss_x), rtol=1e-5)
    assert_allclose(np.asarray(out_p.morphs), np.asarray(out_x.morphs),
                    rtol=1e-5, atol=1e-6)


def test_engine_packed_layout_matches_xla():
    """The persistent lane-packed morphology layout (packed_morphs) gives
    the same fit as the XLA path: pack at program entry, packed kernels
    and prox chain inside, unpack at exit."""
    import dataclasses
    import __graft_entry__ as g

    config, data, state = g._demo_setup()
    out_x, loss_x = engine.fit_scan(state, data, config, 5)
    config_p = dataclasses.replace(
        config, use_pallas=True, use_pallas_scene=True, packed_morphs=True,
        pallas_interpret=True)
    assert engine.packed_morphs_ok(config_p)
    out_p, loss_p = engine.fit_scan(state, data, config_p, 5)
    # returned state is unpacked (same pytree shapes)
    assert np.asarray(out_p.morphs[0]).shape == \
        np.asarray(out_x.morphs[0]).shape
    assert_allclose(np.asarray(loss_p), np.asarray(loss_x), rtol=1e-5)
    assert_allclose(np.asarray(out_p.morphs), np.asarray(out_x.morphs),
                    rtol=1e-5, atol=1e-6)
    assert_allclose(np.asarray(out_p.seds), np.asarray(out_x.seds),
                    rtol=1e-5, atol=1e-7)
    # moments come back in the unpacked layout too
    assert_allclose(np.asarray(out_p.morph_opt[0].v),
                    np.asarray(out_x.morph_opt[0].v), rtol=1e-4, atol=1e-9)


def test_engine_packed_prox_chain_matches_packed():
    """packed_prox_chain (whole prox chain + gating in one aliased
    kernel) == the packed path with the XLA chain, bitwise-level."""
    import dataclasses
    import __graft_entry__ as g

    config, data, state = g._demo_setup()
    config_p = dataclasses.replace(
        config, use_pallas=True, use_pallas_scene=True, packed_morphs=True,
        pallas_interpret=True)
    out_p, loss_p = engine.fit_scan(state, data, config_p, 5)
    config_c = dataclasses.replace(config_p, packed_prox_chain=True)
    out_c, loss_c = engine.fit_scan(state, data, config_c, 5)
    assert_allclose(np.asarray(loss_c), np.asarray(loss_p), rtol=1e-6)
    assert_allclose(np.asarray(out_c.morphs), np.asarray(out_p.morphs),
                    rtol=1e-6, atol=1e-7)
    assert_allclose(np.asarray(out_c.seds), np.asarray(out_p.seds),
                    rtol=1e-6, atol=1e-8)
    assert_allclose(np.asarray(out_c.morph_opt[0].v),
                    np.asarray(out_p.morph_opt[0].v), rtol=1e-5,
                    atol=1e-10)


def test_fused_morph_update_matches_reference():
    """The fused adaprox+prox kernel == the explicit sequence: amsgrad
    moment update, damped step, box-mask confinement, candidate-center
    monotonicity, threshold cut, center floor, max normalization, activity
    gating."""
    from scarlet_tpu.optim import AdaproxState
    from scarlet_tpu.ops.pallas_kernels import fused_morph_update

    rng = np.random.RandomState(11)
    box = (21, 21)
    K = 6
    b1, b2, eps, floor = 0.9, 0.999, 1e-8, 1e-20
    weights, keeps, n_iter = engine.monotonicity_tables(
        box, fit_center_radius=1, neighbor_weight="angle")
    weights = weights.astype(np.float32)
    keeps = keeps.astype(np.float32)

    morphs = rng.rand(K, *box).astype(np.float32)
    morphs[:, 10, 10] += 1.0
    grads = rng.randn(K, *box).astype(np.float32) * 0.1
    opt = AdaproxState(
        m=jnp.asarray(rng.randn(K, *box).astype(np.float32) * 0.05),
        v=jnp.asarray(rng.rand(K, *box).astype(np.float32) * 0.01),
        vhat=jnp.asarray(rng.rand(K, *box).astype(np.float32) * 0.01))
    gate = np.array([True, True, False, True, True, False])
    bmask = np.ones((K, *box), np.float32)
    bmask[1, :, :4] = 0.0
    thr = np.array([0.0, 0.02, 0.0, 0.05, 0.0, 0.0], np.float32)

    for it, damp in ((0, 0.1), (3, 1.0)):
        step = 1e-2 * damp
        got_x, got_opt = fused_morph_update(
            jnp.asarray(morphs), jnp.asarray(grads), opt,
            jnp.asarray(gate), jnp.asarray(weights), jnp.asarray(keeps),
            jnp.asarray(bmask), jnp.asarray(thr), jnp.asarray(step),
            n_iter, 0.0, 1, b1, b2, eps, floor, interpret=True)

        # explicit reference
        m2 = (1 - b1) * grads + b1 * np.asarray(opt.m)
        v2 = (1 - b2) * grads ** 2 + b2 * np.asarray(opt.v)
        vh2 = np.maximum(np.asarray(opt.vhat), v2)
        x1 = (morphs - step * m2 / (np.sqrt(vh2) + eps)) * bmask
        # candidate centers from the 3x3 window
        win = x1[:, 9:12, 9:12].reshape(K, -1)
        idx = np.argmax(win, axis=1).astype(np.int32)
        proxed = np.asarray(batched_monotonic_prox(
            jnp.asarray(x1), jnp.asarray(idx), jnp.asarray(weights),
            jnp.asarray(keeps), n_iter, 0.0, interpret=True))
        proxed = np.where(proxed < thr[:, None, None], 0.0, proxed)
        proxed[:, 10, 10] = np.maximum(proxed[:, 10, 10], floor)
        proxed = proxed / proxed.max(axis=(1, 2), keepdims=True)

        g3 = gate[:, None, None]
        assert_allclose(np.asarray(got_x), np.where(g3, proxed, morphs),
                        rtol=1e-6, atol=1e-7)
        # moments compare with an absolute floor: near-zero elements of
        # (1-b1)g + b1*m cancel catastrophically in f32
        assert_allclose(np.asarray(got_opt.m), np.where(g3, m2, opt.m),
                        rtol=1e-5, atol=1e-6)
        assert_allclose(np.asarray(got_opt.v), np.where(g3, v2, opt.v),
                        rtol=1e-5, atol=1e-9)
        assert_allclose(np.asarray(got_opt.vhat), np.where(g3, vh2, opt.vhat),
                        rtol=1e-5, atol=1e-9)
