"""Checkpoint/resume: engine-state round trip and split-fit equivalence."""
import numpy as np
import pickle

from scarlet_tpu import checkpoint
from scarlet_tpu.lite import engine
import __graft_entry__ as g


def test_fit_state_roundtrip(tmp_path):
    config, data, state = g._demo_setup()
    # advance a few iterations so moments are non-trivial
    state1, losses1 = engine.fit_scan(state, data, config, 7)

    path = checkpoint.save_fit_state(tmp_path / "ckpt", config, state1, data)
    config2, state2, data2 = checkpoint.load_fit_state(path)

    assert config2 == config
    import jax
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state1, state2)

    # resuming from the checkpoint must match an uninterrupted run exactly
    full_state, full_losses = engine.fit_scan(state, data, config, 12)
    resumed_state, resumed_losses = engine.fit_scan(state2, data2, config2, 5)
    np.testing.assert_allclose(np.asarray(resumed_state.morphs),
                               np.asarray(full_state.morphs),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(resumed_losses),
                               np.asarray(full_losses[7:]), rtol=1e-6)


def test_pickle_blend_objects():
    """Reference-style pickle checkpoint of fitted source objects."""
    import scarlet_tpu as st
    from scarlet_tpu import lite

    data = np.load("/root/reference/data/psf_matched_sim.npz")
    images = data["images"].astype(np.float32)
    sigma = np.array([1.4826 * np.median(np.abs(im - np.median(im)))
                      for im in images])
    var = np.ones_like(images) * (sigma ** 2)[:, None, None]
    obs = lite.LiteObservation(
        images, var, 1 / var, data["psfs"].astype(np.float32),
        model_psf=lite.integrated_circular_gaussian(sigma=0.3)[None].astype(
            np.float32))
    centers = [(int(round(r["y"])), int(round(r["x"])))
               for r in data["catalog"]]
    sources = lite.parameterize_sources(
        lite.init_all_sources_main(obs, centers), obs,
        lite.init_adaprox_component)
    blend = lite.LiteBlend(sources, obs)
    blend.fit(10, resize=None, reweight=False)

    blob = pickle.dumps(blend.sources)
    restored = pickle.loads(blob)
    for src, src2 in zip(blend.sources, restored):
        for c, c2 in zip(src.components, src2.components):
            np.testing.assert_array_equal(np.asarray(c.sed),
                                          np.asarray(c2.sed))
            np.testing.assert_array_equal(np.asarray(c.morph),
                                          np.asarray(c2.morph))
