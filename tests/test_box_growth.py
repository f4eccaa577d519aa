"""In-program logical box growth (LiteFitConfig.box_grow): the engine
reformulation of the reference's edge-pull box resize
(ref morphology.py:160-207 + blend.py:152-163 warm restart)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.signal import fftconvolve

from scarlet_tpu import lite, parallel
from scarlet_tpu.parallel import stream
from scarlet_tpu.lite import engine


@pytest.fixture(scope="module")
def oversized():
    """A bright exponential source much larger than a half-7 init box."""
    rng = np.random.default_rng(0)
    C, H, W = 3, 64, 64
    yy, xx = np.mgrid[:H, :W]
    r = np.hypot(yy - 32, xx - 32)
    prof = np.exp(-r / 6.0).astype(np.float32)
    sed = np.asarray([1.0, 2.0, 1.5], np.float32)
    psf = lite.integrated_circular_gaussian(sigma=1.2).astype(np.float32)
    truth = sed[:, None, None] * prof[None] * 30.0
    images = np.stack([fftconvolve(truth[c], psf, mode="same")
                       for c in range(C)]).astype(np.float32)
    variance = np.full_like(images, 0.01)
    images += rng.standard_normal(images.shape).astype(np.float32) * 0.1
    psfs = psf[None].repeat(C, 0)
    mp = lite.integrated_circular_gaussian(sigma=0.8)[None].astype(
        np.float32)
    centers = np.asarray([[32, 32]])

    cfg, data, state, aux = stream.stream_setup(
        images[None], variance[None], psfs[None], centers[None], mp,
        box_size=59, n_slots=2, box_grow=0.1)
    # clip the init mask to half-size 7: the source's wings lie far
    # outside, so the fit MUST grow the box to model them
    bm = np.zeros((1, 2, 59, 59), np.float32)
    bm[:, :, 29 - 7:29 + 8, 29 - 7:29 + 8] = 1.0
    data = data._replace(box_masks=(jnp.asarray(bm),))
    return cfg, data, state


def test_growth_recovers_oversized_source(oversized):
    cfg, data, state = oversized
    cfg_ng = dataclasses.replace(cfg, box_grow=None)
    st_ng = state._replace(box_half=None, step_scale=None)
    out_ng, _ = parallel.fit_batch_device_converged(
        st_ng, data, cfg_ng, 60, check_every=20)
    out_g, _ = parallel.fit_batch_device_converged(
        state, data, cfg, 60, check_every=20)
    logL_ng = float(out_ng.last_loss[0])
    logL_g = float(out_g.last_loss[0])
    half = np.asarray(out_g.box_half[0][0])
    scale = np.asarray(out_g.step_scale[0][0])
    # boxes grew (in +5 quantized steps), steps halved per growth, and
    # the fit quality improved by orders of magnitude
    assert half.max() > 7
    assert np.all(scale[half > 7] < 1.0)
    assert logL_g > logL_ng + 0.5 * abs(logL_ng)
    # growth stays inside the physical bucket
    assert half.max() <= 29


def test_growth_state_is_optional_and_inert_by_default(oversized):
    """box_grow=None + state fields None is the pre-feature path: the
    fitted state matches a fit where the fields were never present."""
    cfg, data, state = oversized
    cfg_ng = dataclasses.replace(cfg, box_grow=None)
    st_none = state._replace(box_half=None, step_scale=None)
    out_a, _ = parallel.fit_batch_device_converged(
        st_none, data, cfg_ng, 10, check_every=10)
    # carrying the state fields through a growth-disabled fit leaves
    # them untouched
    out_b, _ = parallel.fit_batch_device_converged(
        state, data, cfg_ng, 10, check_every=10)
    np.testing.assert_array_equal(np.asarray(out_b.box_half[0]),
                                  np.asarray(state.box_half[0]))
    np.testing.assert_allclose(np.asarray(out_a.morphs[0]),
                               np.asarray(out_b.morphs[0]), rtol=0,
                               atol=0)


def test_growth_packed_interpret_matches_xla(oversized):
    """The packed-layout growth path (Pallas interpret) equals the plain
    XLA path: same grown halves, same logL."""
    cfg, data, state = oversized
    out_x, losses_x = parallel.fit_batch_device_converged(
        state, data, cfg, 30, check_every=10)
    cfg_p = dataclasses.replace(
        cfg, use_pallas=True, use_pallas_scene=True, packed_morphs=True,
        pallas_interpret=True)
    out_p, losses_p = parallel.fit_batch_device_converged(
        state, data, cfg_p, 30, check_every=10)
    np.testing.assert_array_equal(np.asarray(out_p.box_half[0]),
                                  np.asarray(out_x.box_half[0]))
    np.testing.assert_allclose(np.asarray(out_p.last_loss),
                               np.asarray(out_x.last_loss), rtol=1e-3)


def test_growth_shards_over_mesh(oversized):
    """box_half/step_scale shard over the blends axis like every other
    state leaf (the multichip path carries them)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scarlet_tpu.parallel.batch import _SHARED_FIELDS

    cfg, data, state = oversized
    B = 8
    # un-batch the B=1 stream pytrees (the monotonicity tables are
    # shared/unbatched already)
    take0 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: None if x is None else x[0], t,
        is_leaf=lambda x: x is None)
    d0 = data._replace(**{
        name: getattr(data, name) if name in _SHARED_FIELDS
        else take0(getattr(data, name))
        for name in data._fields})
    bdata, bstate = parallel.replicate_blend(d0, take0(state), B)
    mesh = parallel.make_mesh(8)
    sdata, sstate = parallel.shard_batch(bdata, bstate, mesh)
    with mesh:
        out, _ = parallel.fit_batch(sstate, sdata, cfg, 5)
    half = np.asarray(out.box_half[0])
    assert half.shape[0] == B
    # all replicas agree (they are the same blend)
    assert np.all(half == half[:1])
