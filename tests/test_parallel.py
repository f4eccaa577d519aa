"""Batched (vmap) and sharded (mesh) deblending tests: batch results must
equal single-blend results, and the sharded path must run on a virtual
8-device mesh (SURVEY.md §4.5)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax

import scarlet_tpu as st
from scarlet_tpu import lite, parallel
from scarlet_tpu.lite import engine


@pytest.fixture(scope="module")
def sim_blend():
    data = np.load("/root/reference/data/psf_matched_sim.npz")
    images = data["images"].astype(np.float32)
    psfs = data["psfs"].astype(np.float32)
    catalog = data["catalog"]
    sigma = np.array([
        1.4826 * np.median(np.abs(im - np.median(im))) for im in images
    ])
    variance = np.ones_like(images) * (sigma ** 2)[:, None, None]
    weights = 1.0 / variance
    model_psf = lite.integrated_circular_gaussian(sigma=0.3)[None].astype(
        np.float32)
    obs = lite.LiteObservation(images, variance, weights, psfs,
                               model_psf=model_psf)
    centers = [(int(np.round(row["y"])), int(np.round(row["x"])))
               for row in catalog]
    sources = lite.init_all_sources_main(obs, centers, min_snr=50)
    sources = lite.parameterize_sources(sources, obs,
                                        lite.init_adaprox_component)
    return lite.LiteBlend(sources, obs)


class TestBatched:
    def test_batch_matches_single(self, sim_blend):
        config, data, state = sim_blend.engine_setup()

        # single blend: 20 iterations
        single_state, single_losses = engine.fit_scan(state, data, config, 20)

        # batch of 4 replicas
        bdata, bstate = parallel.replicate_blend(data, state, 4)
        batch_state, batch_losses = parallel.fit_batch(bstate, bdata, config,
                                                       20)

        assert batch_losses.shape == (20, 4)
        for b in range(4):
            np.testing.assert_allclose(
                np.asarray(batch_losses[:, b]), np.asarray(single_losses),
                rtol=1e-5)
            jax.tree.map(
                lambda bt, sg, b=b: np.testing.assert_allclose(
                    np.asarray(bt[b]), np.asarray(sg), rtol=1e-4, atol=1e-5),
                batch_state.seds, single_state.seds)

    def test_heterogeneous_pack_blends(self):
        """Distinct blends (different crops, scene sizes, and component
        counts) packed to a shared layout: the batched fit must match each
        blend's own single fit, and write-back must land per blend."""
        data = np.load("/root/reference/data/psf_matched_sim.npz")
        images = data["images"].astype(np.float32)
        psfs = data["psfs"].astype(np.float32)
        catalog = data["catalog"]
        sigma = np.array([
            1.4826 * np.median(np.abs(im - np.median(im))) for im in images
        ])
        model_psf = lite.integrated_circular_gaussian(sigma=0.3)[None].astype(
            np.float32)

        def make(y0, y1, x0, x1):
            imgs = images[:, y0:y1, x0:x1]
            variance = np.ones_like(imgs) * (sigma ** 2)[:, None, None]
            obs = lite.LiteObservation(imgs, variance, 1.0 / variance, psfs,
                                       model_psf=model_psf)
            centers = [
                (int(np.round(r["y"])) - y0, int(np.round(r["x"])) - x0)
                for r in catalog
                if y0 + 3 <= r["y"] < y1 - 3 and x0 + 3 <= r["x"] < x1 - 3
            ]
            sources = lite.init_all_sources_main(obs, centers, min_snr=50)
            sources = lite.parameterize_sources(sources, obs,
                                                lite.init_adaprox_component)
            return lite.LiteBlend(sources, obs)

        H, W = images.shape[1:]
        blends = [make(0, H, 0, W), make(0, H - 10, 6, W),
                  make(8, H, 0, W - 12)]
        ks = [len(b.components) for b in blends]
        shapes = [b.observation.shape for b in blends]
        assert len(set(ks)) > 1 or len(set(shapes)) > 1

        config, bdata, bstate = parallel.pack_blends(blends, e_rel=1e-4)
        assert bdata.images.shape[0] == 3
        batch_state, batch_losses = parallel.fit_batch(bstate, bdata,
                                                       config, 15)

        # vmap batch == per-blend loop at the shared layout
        shared = {"mono_weights", "mono_keep"}
        for i in range(3):
            dsub = engine.BlendData(**{
                name: getattr(bdata, name) if name in shared else
                jax.tree.map(lambda x, i=i: None if x is None else x[i],
                             getattr(bdata, name),
                             is_leaf=lambda x: x is None)
                for name in bdata._fields})
            ssub = jax.tree.map(lambda x, i=i: x[i], bstate)
            sstate, slosses = engine.fit_scan(ssub, dsub, config, 15)
            np.testing.assert_allclose(np.asarray(batch_losses[:, i]),
                                       np.asarray(slosses), rtol=1e-5)

        # shared-layout fit tracks each blend's natural-layout fit
        for i, bl in enumerate(blends):
            ncfg, ndata, nstate = bl.engine_setup(e_rel=1e-4)
            _, nlosses = engine.fit_scan(nstate, ndata, ncfg, 15)
            np.testing.assert_allclose(np.asarray(batch_losses[:, i]),
                                       np.asarray(nlosses), rtol=1e-3)

        # write-back: iteration counts, loss histories, improved models
        parallel.unpack_blends(blends, batch_state, batch_losses)
        for i, bl in enumerate(blends):
            assert bl.it > 0
            assert len(bl.loss) == bl.it
            assert bl.loss[-1] > bl.loss[0]

    def test_sharded_mesh(self, sim_blend):
        """Batch sharded over an 8-device mesh compiles, runs, and matches
        the unsharded result."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        config, data, state = sim_blend.engine_setup()
        bdata, bstate = parallel.replicate_blend(data, state, 8)

        ref_state, ref_losses = parallel.fit_batch(bstate, bdata, config, 5)

        mesh = parallel.make_mesh(8, bands=1)
        sdata, sstate = parallel.shard_batch(bdata, bstate, mesh)
        with mesh:
            out_state, out_losses = parallel.fit_batch(sstate, sdata, config,
                                                       5)
        np.testing.assert_allclose(np.asarray(out_losses),
                                   np.asarray(ref_losses), rtol=1e-5)

    def test_band_sharded_shard_map(self, sim_blend):
        """Band-axis model parallelism (shard_map over a ("blends",
        "bands") mesh with explicit psum collectives) must match the
        unsharded fit: each device holds C/bands channels; the FFT stays
        local per shard."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        # 4-channel synthetic blend (6 channels don't split 2-ways... 6 do;
        # the sim has 6 bands which splits over bands=2 evenly)
        config, data, state = sim_blend.engine_setup()
        C = config.scene_shape[0]
        bands = 2
        if C % bands != 0:
            pytest.skip(f"{C} channels not divisible by {bands}")
        bdata, bstate = parallel.replicate_blend(data, state, 4)
        ref_state, ref_losses = parallel.fit_batch(bstate, bdata, config, 5)

        mesh = parallel.make_mesh(8, bands=bands)
        with mesh:
            out_state, out_losses = parallel.fit_batch_sharded(
                bstate, bdata, config, 5, mesh, shard_bands=True)
        np.testing.assert_allclose(np.asarray(out_losses),
                                   np.asarray(ref_losses), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            (out_state.seds, out_state.morphs),
            (ref_state.seds, ref_state.morphs))

    def test_sharded_with_scene_mask(self, sim_blend):
        """fit_batch_sharded on data carrying a scene_mask (every
        pack_blends/heterogeneous layout sets one) — regression: the
        shard_map partition spec used to omit the field (KeyError)."""
        import jax.numpy as jnp

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        config, data, state = sim_blend.engine_setup()
        bdata, bstate = parallel.replicate_blend(data, state, 8)
        C, H, W = config.scene_shape
        ref_state, ref_losses = parallel.fit_batch(bstate, bdata, config, 5)
        # an all-real mask must not change the result
        bdata = bdata._replace(
            scene_mask=jnp.ones((8, H, W), jnp.asarray(bdata.images).dtype))
        mesh = parallel.make_mesh(8, bands=1)
        out_state, out_losses = parallel.fit_batch_sharded(
            bstate, bdata, config, 5, mesh)
        np.testing.assert_allclose(np.asarray(out_losses),
                                   np.asarray(ref_losses), rtol=1e-5)


class TestDeviceConverged:
    def test_matches_host_segments(self, sim_blend):
        """The single-program device-side convergence loop must match the
        host-segmented fit (same per-blend stops, same losses)."""
        config, data, state = sim_blend.engine_setup(e_rel=1e-3)
        bdata, bstate = parallel.replicate_blend(data, state, 4)
        ref_state, ref_losses = parallel.fit_batch_converged(
            bstate, bdata, config, 40, segment=10)
        out_state, out_losses = parallel.fit_batch_device_converged(
            bstate, bdata, config, 40, check_every=10)
        n = min(ref_losses.shape[0], out_losses.shape[0])
        np.testing.assert_allclose(np.asarray(out_losses[:n]),
                                   np.asarray(ref_losses[:n]), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_state.it),
                                      np.asarray(ref_state.it))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            out_state.seds, ref_state.seds)

    def test_cap_exact_when_not_segment_multiple(self, sim_blend):
        """max_iter is a hard cap even when it is not a multiple of
        check_every: the tail runs as a remainder-length scan instead of
        overshooting to the next segment boundary."""
        config, data, state = sim_blend.engine_setup(e_rel=1e-6)
        bdata, bstate = parallel.replicate_blend(data, state, 2)
        out_state, losses = parallel.fit_batch_device_converged(
            bstate, bdata, config, 13, check_every=5)
        assert losses.shape[0] == 13
        np.testing.assert_array_equal(np.asarray(out_state.it), 13)
        ref_state, ref_losses = parallel.fit_batch(bstate, bdata, config, 13)
        np.testing.assert_allclose(np.asarray(losses),
                                   np.asarray(ref_losses), rtol=1e-5)


class TestDftConvEngine:
    def test_dft_conv_mode_matches_fft(self, sim_blend):
        """The fit under conv_mode='dft' (folded matmul-DFT) tracks the FFT
        path: same loss trajectory to f32-roundoff accumulation."""
        import dataclasses

        config, data, state = sim_blend.engine_setup(e_rel=1e-6)
        dft_config = dataclasses.replace(config, conv_mode="dft")
        _, l_fft = engine.fit_scan(state, data, config, 15)
        _, l_dft = engine.fit_scan(state, data, dft_config, 15)
        np.testing.assert_allclose(np.asarray(l_dft), np.asarray(l_fft),
                                   rtol=1e-4)
