"""Device-side batched initialization (parallel.stream): the vmapped XLA
init must reproduce the host initialization recipe
(lite/initialization.py:321-419 semantics) and feed the same fit."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax

from scarlet_tpu import lite, parallel
from scarlet_tpu.parallel import stream


@pytest.fixture(scope="module")
def hsc():
    d = np.load("/root/reference/data/hsc_cosmos_35.npz", allow_pickle=True)
    images = d["images"].astype(np.float32)
    variance = d["variance"].astype(np.float32)
    return {
        "images": images,
        "variance": variance,
        "weights": (1.0 / np.maximum(variance, 1e-12)).astype(np.float32),
        "psfs": d["psfs"].astype(np.float32),
        "centers": [(int(round(r["y"])), int(round(r["x"])))
                    for r in d["catalog"]],
        "model_psf": lite.integrated_circular_gaussian(
            sigma=0.8)[None].astype(np.float32),
    }


@pytest.fixture(scope="module")
def host_setup(hsc):
    obs = lite.LiteObservation(hsc["images"], hsc["variance"],
                               hsc["weights"], hsc["psfs"],
                               model_psf=hsc["model_psf"])
    srcs = lite.init_all_sources_main(obs, hsc["centers"], min_snr=50)
    srcs = lite.parameterize_sources(srcs, obs, lite.init_adaprox_component)
    blend = lite.LiteBlend(srcs, obs)
    return blend, blend.engine_setup(e_rel=1e-4)


@pytest.fixture(scope="module")
def stream_setup_out(hsc, host_setup):
    _, (cfg, _, _) = host_setup
    S = cfg.box_shapes[0][0]
    n_slots = cfg.bucket_counts[0]
    return stream.stream_setup(
        hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
        np.asarray(hsc["centers"])[None], hsc["model_psf"],
        box_size=S, n_slots=n_slots)


class TestStreamInit:
    def test_layout_matches_host(self, host_setup, stream_setup_out):
        """Discrete init decisions (origins, logical boxes, slot order,
        split gating) must equal the host path exactly."""
        blend, (cfg, hdata, hstate) = host_setup
        scfg, sdata, sstate, aux = stream_setup_out
        assert scfg.box_shapes == cfg.box_shapes
        assert scfg.bucket_counts == cfg.bucket_counts
        assert scfg.fft_shape == cfg.fft_shape
        assert scfg.bg_thresh == cfg.bg_thresh
        assert not bool(np.asarray(aux["overflow"])[0])
        np.testing.assert_array_equal(np.asarray(sstate.origins[0][0]),
                                      np.asarray(hstate.origins[0]))
        np.testing.assert_array_equal(np.asarray(sstate.comp_active[0][0]),
                                      np.asarray(hstate.comp_active[0]))
        np.testing.assert_array_equal(np.asarray(sdata.box_masks[0][0]),
                                      np.asarray(hdata.box_masks[0]))
        # kernel rFFTs: device match_psf == host match_psf bitwise
        np.testing.assert_array_equal(np.asarray(sdata.kernel_rfft[0]),
                                      np.asarray(hdata.kernel_rfft))

    def test_mono_tol_default_wiring(self, hsc, host_setup):
        """The stream's mono_tol default is backend-split: 0.0 on CPU
        (exact reference-parity projection) and 1e-3 on accelerators
        (+17% with final records measured bitwise identical — BASELINE
        r4); an explicit value always wins."""
        _, (cfg, _, _) = host_setup
        S = cfg.box_shapes[0][0]
        n_slots = cfg.bucket_counts[0]

        def setup(**kw):
            c, _, _, _ = stream.stream_setup(
                hsc["images"][None], hsc["variance"][None],
                hsc["psfs"][None], np.asarray(hsc["centers"])[None],
                hsc["model_psf"], box_size=S, n_slots=n_slots, **kw)
            return c

        assert setup().mono_tol == 0.0                 # CPU test backend
        assert setup(platform="tpu").mono_tol == 1e-3
        assert setup(platform="tpu", mono_tol=0.0).mono_tol == 0.0
        assert setup(mono_tol=5e-4).mono_tol == 5e-4

    def test_seeds_match_host(self, host_setup, stream_setup_out):
        _, (cfg, hdata, hstate) = host_setup
        scfg, sdata, sstate, aux = stream_setup_out
        hseds = np.asarray(hstate.seds[0])
        sseds = np.asarray(sstate.seds[0][0])
        np.testing.assert_allclose(sseds, hseds,
                                   rtol=2e-2, atol=1e-3 * hseds.max())
        hm = np.asarray(hstate.morphs[0])
        sm = np.asarray(sstate.morphs[0][0])
        np.testing.assert_allclose(sm, hm, atol=2e-2)

    def test_fit_parity(self, host_setup, stream_setup_out):
        """Fitting from the device init must reach the host-init result:
        same logL (0.5%) and per-source fluxes (2%)."""
        _, (cfg, hdata, hstate) = host_setup
        scfg, sdata, sstate, aux = stream_setup_out
        bdata, bstate = parallel.replicate_blend(hdata, hstate, 1)
        hout, _ = parallel.fit_batch_device_converged(
            bstate, bdata, cfg, 50, check_every=25)
        sout, slosses = parallel.fit_batch_device_converged(
            sstate, sdata, scfg, 50, check_every=25)
        h_logL = float(hout.last_loss[0])
        s_logL = float(sout.last_loss[0])
        assert abs(s_logL - h_logL) < 5e-3 * abs(h_logL)

        flux = np.asarray(stream._stream_records_device(sout, aux)[0])[0]
        hflux = (np.asarray(hout.seds[0][0])
                 * np.asarray(hout.morphs[0][0]).sum(axis=(1, 2))[:, None])
        slot_src = [0, 0, 1, 1, 2, 2, 3, 4, 5, 6]
        hsrc = np.zeros((7, hflux.shape[1]), hflux.dtype)
        for k, s in enumerate(slot_src):
            hsrc[s] += hflux[k]
        np.testing.assert_allclose(flux.sum(1), hsrc.sum(1), rtol=2e-2)

    def test_records(self, stream_setup_out):
        scfg, sdata, sstate, aux = stream_setup_out
        out, losses = parallel.fit_batch_device_converged(
            sstate, sdata, scfg, 10, check_every=10)
        recs = stream.stream_records(out, losses, aux)
        assert len(recs) == 1
        assert recs[0]["n_components"] == 10
        assert np.isfinite(recs[0]["logL"])
        assert recs[0]["logL"] > recs[0]["init logL"]
        assert recs[0]["flux"].shape == (7, 5)
        assert recs[0]["centroid"].shape == (7, 2)
        assert recs[0]["snr"].shape == (7,)
        assert np.all(recs[0]["snr"] > 0)

    def test_record_centroids_match_host_measure(self, stream_setup_out):
        """Device centroids == measure.centroid on the assembled
        per-source scene model (host numpy oracle)."""
        from scarlet_tpu import measure

        scfg, sdata, sstate, aux = stream_setup_out
        out, losses = parallel.fit_batch_device_converged(
            sstate, sdata, scfg, 10, check_every=10)
        recs = stream.stream_records(out, losses, aux)
        seds = np.asarray(out.seds[0][0])        # (n_slots, C)
        morphs = np.asarray(out.morphs[0][0])    # (n_slots, S, S)
        origins = np.asarray(out.origins[0][0])  # (n_slots, 2)
        on = np.asarray(out.comp_active[0][0])
        slot_src = np.asarray(aux["slot_source"][0])
        C, S = seds.shape[1], morphs.shape[-1]
        H, W = scfg.scene_shape[-2:]
        K = recs[0]["centroid"].shape[0]
        for s in range(K):
            model = np.zeros((C, H + 2 * S, W + 2 * S))
            for k in range(len(slot_src)):
                if not on[k] or slot_src[k] != s:
                    continue
                oy, ox = origins[k] + S
                model[:, oy:oy + S, ox:ox + S] += (
                    seds[k][:, None, None] * morphs[k][None])
            if model.sum() == 0:
                continue
            cen = measure.centroid(model)[-2:] - S
            np.testing.assert_allclose(recs[0]["centroid"][s], cen,
                                       rtol=1e-5, atol=1e-4)

    def test_record_moments_match_explicit_oracle(self, stream_setup_out):
        """Device central second moments == explicit numpy sums over the
        assembled channel-summed per-source model."""
        scfg, sdata, sstate, aux = stream_setup_out
        out, losses = parallel.fit_batch_device_converged(
            sstate, sdata, scfg, 10, check_every=10)
        recs = stream.stream_records(out, losses, aux)
        assert recs[0]["moments"].shape == (7, 3)
        seds = np.asarray(out.seds[0][0])
        morphs = np.asarray(out.morphs[0][0])
        origins = np.asarray(out.origins[0][0])
        on = np.asarray(out.comp_active[0][0])
        slot_src = np.asarray(aux["slot_source"][0])
        S = morphs.shape[-1]
        H, W = scfg.scene_shape[-2:]
        for s in range(7):
            img = np.zeros((H + 2 * S, W + 2 * S))
            for k in range(len(slot_src)):
                if not on[k] or slot_src[k] != s:
                    continue
                oy, ox = origins[k] + S
                img[oy:oy + S, ox:ox + S] += seds[k].sum() * morphs[k]
            tot = img.sum()
            if tot == 0:
                assert not np.any(np.isfinite(recs[0]["moments"][s]))
                continue
            yy, xx = np.mgrid[: img.shape[0], : img.shape[1]].astype(float)
            cy = (yy * img).sum() / tot
            cx = (xx * img).sum() / tot
            oracle = np.array([
                ((yy - cy) ** 2 * img).sum() / tot,
                ((xx - cx) ** 2 * img).sum() / tot,
                ((yy - cy) * (xx - cx) * img).sum() / tot,
            ])
            # the device form centralizes per slot about the source
            # centroid (O(box) offsets, no coord^2 cancellation), so it
            # tracks the f64 oracle to f32 roundoff
            np.testing.assert_allclose(recs[0]["moments"][s], oracle,
                                       rtol=3e-4, atol=3e-4)

    def test_weighted_flux_matches_host(self, hsc, host_setup,
                                        stream_setup_out):
        """Device flux reweighting == lite.measure.weight_sources."""
        blend, (cfg, hdata, hstate) = host_setup
        scfg, sdata, sstate, aux = stream_setup_out
        bdata, bstate = parallel.replicate_blend(hdata, hstate, 1)
        hout, hlosses = parallel.fit_batch_device_converged(
            bstate, bdata, cfg, 50, check_every=25)
        parallel.unpack_blends([blend], hout, hlosses, reweight=True)
        hflux = np.stack([np.asarray(s.flux).sum(axis=(-2, -1))
                          for s in blend.sources])

        sout, slosses = parallel.fit_batch_device_converged(
            sstate, sdata, scfg, 50, check_every=25)
        recs = stream.stream_records(sout, slosses, aux, data=sdata,
                                     config=scfg, reweight=True)
        np.testing.assert_allclose(recs[0]["flux"], hflux,
                                   rtol=2e-2, atol=1e-2 * hflux.max())

    def test_packed_layout_matches_plain(self, stream_setup_out):
        """The TPU stream config (packed_morphs + Pallas kernels, here in
        interpret mode) must reproduce the plain XLA fit through the
        production while-program — covers pack/unpack inside
        `_fit_batch_while` on the stream layout."""
        import dataclasses

        from scarlet_tpu.lite import engine

        scfg, sdata, sstate, aux = stream_setup_out
        pcfg = dataclasses.replace(
            scfg, use_pallas=True, use_pallas_scene=True,
            packed_morphs=True, pallas_interpret=True)
        assert engine.packed_morphs_ok(pcfg)
        out, losses = parallel.fit_batch_device_converged(
            sstate, sdata, scfg, 10, check_every=10)
        pout, plosses = parallel.fit_batch_device_converged(
            sstate, sdata, pcfg, 10, check_every=10)
        assert np.asarray(pout.morphs[0]).shape == \
            np.asarray(out.morphs[0]).shape
        np.testing.assert_allclose(np.asarray(plosses),
                                   np.asarray(losses), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(pout.morphs),
                                   np.asarray(out.morphs),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pout.seds),
                                   np.asarray(out.seds),
                                   rtol=1e-4, atol=1e-7)

    def test_psf_fallback_and_center_mask(self, hsc):
        """A center on blank sky falls back to the PSF morphology; masked
        center rows produce inactive slots."""
        rng = np.random.default_rng(3)
        C, H, W = 5, 48, 48
        variance = np.full((C, H, W), 1e-4, np.float32)
        images = (rng.standard_normal((C, H, W)).astype(np.float32)
                  * np.sqrt(variance))
        # one bright PSF-like source at (24, 24)
        psf = lite.integrated_circular_gaussian(sigma=1.1).astype(np.float32)
        ph = psf.shape[0] // 2
        images[:, 24 - ph:24 + ph + 1, 24 - ph:24 + ph + 1] += psf * 5.0
        psfs = np.repeat(
            lite.integrated_circular_gaussian(sigma=1.1)[None], C,
            axis=0).astype(np.float32)
        centers = np.asarray([[24, 24], [8, 40], [10, 10]])
        active = np.asarray([True, True, False])
        cfg, data, state, aux = stream.stream_setup(
            images[None], variance[None], psfs[None], centers[None],
            hsc["model_psf"], center_active=active[None],
            box_size=21, n_slots=4)
        fb = np.asarray(aux["psf_fallback"])[0]
        assert not fb[0]            # real source seeds from detection
        assert fb[1]                # blank sky -> PSF fallback
        on = np.asarray(state.comp_active[0][0])
        src = np.asarray(aux["slot_source"])[0]
        assert set(src[on].tolist()) <= {0, 1}   # masked center 2 excluded
        assert int(np.asarray(aux["n_active"])[0]) == int(on.sum())

    def test_overflow_flag(self, hsc):
        """More active components than slots sets the overflow flag, and
        slotless sources report NaN centroids (not (0, 0)) so the
        pos-diff metric and CLI can skip them."""
        cfg, data, state, aux = stream.stream_setup(
            hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
            np.asarray(hsc["centers"])[None], hsc["model_psf"],
            box_size=59, n_slots=4)
        assert bool(np.asarray(aux["overflow"])[0])
        assert int(np.asarray(state.comp_active[0][0]).sum()) == 4

        flux, cen, mom = stream._stream_records_device(state, aux)
        cen = np.asarray(cen)[0]
        mom = np.asarray(mom)[0]
        slotted = np.unique(np.asarray(aux["slot_source"][0])[
            np.asarray(state.comp_active[0][0])])
        for s in range(cen.shape[0]):
            if s in slotted:
                assert np.all(np.isfinite(cen[s])), (s, cen[s])
                assert np.all(np.isfinite(mom[s])), (s, mom[s])
            else:
                assert np.all(np.isnan(cen[s])), (s, cen[s])
                assert np.all(np.isnan(mom[s])), (s, mom[s])

    def test_overflow_retry_keeps_every_peak(self, hsc):
        """retry_overflow=True: blends whose init wants more components
        than n_slots re-fit at a larger slot count — no active detected
        peak is dropped (the reference keeps every peak, ref
        initialization.py:287-363)."""
        K = len(hsc["centers"])
        recs, state, losses, aux = stream.deblend_device_stream(
            hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
            np.asarray(hsc["centers"])[None], hsc["model_psf"],
            box_size=59, n_slots=4, max_iter=6, check_every=6,
            retry_overflow=True)
        # the retry pass appends one chunk entry carrying its indices
        assert isinstance(aux, list) and len(aux) == 2
        assert np.asarray(aux[1]["retry_indices"]).tolist() == [0]
        assert aux[1]["retry_n_slots"] >= int(
            np.asarray(aux[0]["n_active"])[0])
        rec = recs[0]
        assert rec["overflow"] and rec["overflow_retried"]
        # every catalog source ends with at least one slot: finite
        # centroid and nonzero flux row for all K sources
        assert np.all(np.isfinite(rec["centroid"])), rec["centroid"]
        assert rec["flux"].shape[0] == K
        slotted = np.unique(np.asarray(aux[1]["slot_source"][0])[
            np.asarray(state[1].comp_active[0][0])])
        assert set(range(K)) <= set(slotted.tolist())
        # padded retry rows (16-row bucket) carry no active slots
        assert not np.any(np.asarray(state[1].comp_active[0][1:]))

    def test_overflow_retry_with_redetect(self, hsc):
        """redetect and retry_overflow compose: the retry lane runs once,
        on the FINAL catalog, and the redetect aux rewrite indexes the
        retry entry by retry_indices (one catalog row per retried blend,
        not the padded retry batch)."""
        recs, state, losses, aux = stream.deblend_device_stream(
            hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
            np.asarray(hsc["centers"])[None], hsc["model_psf"],
            box_size=59, n_slots=4, max_iter=6, check_every=6,
            redetect=1, retry_overflow=True)
        assert isinstance(aux, list) and len(aux) == 2
        retry = aux[1]
        ri = np.asarray(retry["retry_indices"])
        assert ri.tolist() == [0]
        # surfaced catalogs: the main entry carries the final catalog for
        # its chunk rows, the retry entry only the retried blends' rows
        assert np.asarray(aux[0]["centers"]).shape[0] == 1
        assert np.asarray(retry["centers"]).shape[0] == ri.size
        assert np.asarray(retry["center_active"]).shape[0] == ri.size
        rec = recs[0]
        assert rec["overflow"] and rec["overflow_retried"]
        # the retry layout holds every final-catalog source: each active
        # catalog row owns at least one live slot in the retry state
        act = np.asarray(retry["center_active"])[0]
        slotted = np.unique(np.asarray(retry["slot_source"][0])[
            np.asarray(state[-1].comp_active[0][0])])
        assert set(np.nonzero(act)[0].tolist()) <= set(slotted.tolist())

    def test_overflow_retry_noop_when_no_overflow(self, hsc):
        """With enough slots the retry lane is a no-op: unchanged return
        contract (no extra chunk entry), no record flags."""
        recs, state, losses, aux = stream.deblend_device_stream(
            hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
            np.asarray(hsc["centers"])[None], hsc["model_psf"],
            box_size=59, n_slots=10, max_iter=6, check_every=6,
            retry_overflow=True)
        assert not isinstance(aux, list)
        assert not recs[0]["overflow"]
        assert "overflow_retried" not in recs[0]

    def test_stream_sharded_over_mesh(self, hsc):
        """Blends-axis GSPMD sharding propagates through the device init
        AND the fit: 8 blends sharded over the virtual 8-device mesh match
        the unsharded run."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        rng = np.random.default_rng(0)
        B = 8
        ims = np.stack([
            hsc["images"] + rng.standard_normal(hsc["images"].shape)
            .astype(np.float32) * np.sqrt(hsc["variance"]) * 0.3
            for _ in range(B)])
        var = np.repeat(hsc["variance"][None], B, 0)
        ps = np.repeat(hsc["psfs"][None], B, 0)
        cs = np.repeat(np.asarray(hsc["centers"])[None], B, 0)

        mesh = parallel.make_mesh(8)
        sh = NamedSharding(mesh, P("blends"))
        args_s = [jax.device_put(x, sh) for x in (ims, var, ps, cs)]
        cfgS, dataS, stateS, auxS = stream.stream_setup(
            *args_s, hsc["model_psf"], box_size=59, n_slots=10)
        assert "blends" in str(stateS.morphs[0].sharding)
        outS, lS = parallel.fit_batch(stateS, dataS, cfgS, 10)

        cfgU, dataU, stateU, auxU = stream.stream_setup(
            ims, var, ps, cs, hsc["model_psf"], box_size=59, n_slots=10)
        outU, lU = parallel.fit_batch(stateU, dataU, cfgU, 10)
        np.testing.assert_allclose(np.asarray(lS), np.asarray(lU),
                                   rtol=1e-5)

    def test_batch_of_distinct_blends(self, hsc):
        """Distinct blends in one stream batch fit to finite, improving
        losses; single-blend and batched runs agree."""
        rng = np.random.default_rng(11)
        ims, var = [], []
        for i in range(3):
            noise = (rng.standard_normal(hsc["images"].shape)
                     .astype(np.float32) * np.sqrt(hsc["variance"]) * 0.3)
            ims.append(hsc["images"] + noise)
            var.append(hsc["variance"])
        images = np.stack(ims)
        variance = np.stack(var)
        psfs = np.repeat(hsc["psfs"][None], 3, axis=0)
        centers = np.repeat(np.asarray(hsc["centers"])[None], 3, axis=0)
        recs, out, losses, aux = stream.deblend_device_stream(
            images, variance, psfs, centers, hsc["model_psf"],
            box_size=59, n_slots=10, max_iter=20, check_every=20)
        assert len(recs) == 3
        for r in recs:
            assert np.isfinite(r["logL"])
            assert r["logL"] > r["init logL"]

        # blend 0 alone == blend 0 in the batch
        recs1, *_ = stream.deblend_device_stream(
            images[:1], variance[:1], psfs[:1], centers[:1],
            hsc["model_psf"], box_size=59, n_slots=10, max_iter=20,
            check_every=20)
        np.testing.assert_allclose(recs1[0]["logL"], recs[0]["logL"],
                                   rtol=1e-4)
        np.testing.assert_allclose(recs1[0]["flux"], recs[0]["flux"],
                                   rtol=1e-3, atol=1e-3)

    def test_chunked_stream_matches_unchunked(self, hsc):
        """chunk= pipelined dispatch returns the same records as one
        batch."""
        rng = np.random.default_rng(21)
        ims, var = [], []
        for i in range(4):
            noise = (rng.standard_normal(hsc["images"].shape)
                     .astype(np.float32) * np.sqrt(hsc["variance"]) * 0.3)
            ims.append(hsc["images"] + noise)
            var.append(hsc["variance"])
        images = np.stack(ims)
        variance = np.stack(var)
        psfs = np.repeat(hsc["psfs"][None], 4, axis=0)
        centers = np.repeat(np.asarray(hsc["centers"])[None], 4, axis=0)
        r1, *_ = stream.deblend_device_stream(
            images, variance, psfs, centers, hsc["model_psf"],
            box_size=59, n_slots=10, max_iter=15, check_every=15)
        r2, *_ = stream.deblend_device_stream(
            images, variance, psfs, centers, hsc["model_psf"],
            box_size=59, n_slots=10, max_iter=15, check_every=15, chunk=2)
        assert len(r2) == 4
        for a, b in zip(r1, r2):
            np.testing.assert_allclose(a["logL"], b["logL"], rtol=1e-5)
            np.testing.assert_allclose(a["flux"], b["flux"], rtol=1e-4,
                                       atol=1e-4)

    def test_bf16_upload_matches_f32(self, hsc):
        """upload_dtype=bfloat16 quantizes only the transferred inputs
        (compute stays f32): records match the f32-upload path to the
        input-quantization level (~0.4% per value)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(31)
        ims, var = [], []
        for i in range(2):
            noise = (rng.standard_normal(hsc["images"].shape)
                     .astype(np.float32) * np.sqrt(hsc["variance"]) * 0.3)
            ims.append(hsc["images"] + noise)
            var.append(hsc["variance"])
        images = np.stack(ims)
        variance = np.stack(var)
        psfs = np.repeat(hsc["psfs"][None], 2, axis=0)
        centers = np.repeat(np.asarray(hsc["centers"])[None], 2, axis=0)
        kw = dict(box_size=59, n_slots=10, max_iter=15, check_every=15)
        r32, out32, *_ = stream.deblend_device_stream(
            images, variance, psfs, centers, hsc["model_psf"], **kw)
        r16, out16, *_ = stream.deblend_device_stream(
            images, variance, psfs, centers, hsc["model_psf"],
            upload_dtype=jnp.bfloat16, **kw)
        # the fit state itself must be f32 — only the upload was quantized
        assert out16.morphs[0].dtype == out32.morphs[0].dtype
        for a, b in zip(r32, r16):
            np.testing.assert_allclose(a["logL"], b["logL"], rtol=3e-3)
            total = np.abs(np.asarray(a["flux"])).max()
            np.testing.assert_allclose(np.asarray(a["flux"]),
                                       np.asarray(b["flux"]),
                                       rtol=0.03, atol=0.02 * total)

    def test_compacted_stream_matches_plain(self, hsc):
        """Convergence compaction (gather stragglers into a residual
        batch after ``compact`` iterations) returns the same fits as the
        single-program path: frozen blends untouched, stragglers continue
        the identical iterate sequence."""
        rng = np.random.default_rng(5)
        ims = []
        for i in range(4):
            noise = (rng.standard_normal(hsc["images"].shape)
                     .astype(np.float32) * np.sqrt(hsc["variance"])
                     * np.float32(0.2 + 0.2 * i))
            ims.append(hsc["images"] * np.float32(0.8 + 0.1 * i) + noise)
        images = np.stack(ims)
        variance = np.repeat(hsc["variance"][None], 4, axis=0)
        psfs = np.repeat(hsc["psfs"][None], 4, axis=0)
        centers = np.repeat(np.asarray(hsc["centers"])[None], 4, axis=0)
        kw = dict(box_size=59, n_slots=10, max_iter=20, check_every=5,
                  e_rel=1e-3)
        r1, *_ = stream.deblend_device_stream(
            images, variance, psfs, centers, hsc["model_psf"], **kw)
        for compact in (10, [5, 10, 15]):
            r2, out2, _, aux2 = stream.deblend_device_stream(
                images, variance, psfs, centers, hsc["model_psf"],
                chunk=2, compact=compact, **kw)
            assert len(r2) == 4
            for a, b in zip(r1, r2):
                assert a["iterations"] == b["iterations"]
                np.testing.assert_allclose(a["logL"], b["logL"], rtol=1e-6)
                np.testing.assert_allclose(a["flux"], b["flux"], rtol=1e-5,
                                           atol=1e-5)
            # merged return carries the whole stream
            assert np.asarray(out2.it).shape == (4,)

    def test_heterogeneous_crops_via_scene_valid(self, hsc):
        """Different-sized crops zero-padded to one (H, W) with a
        scene_valid mask reproduce each crop's own host-path fit:
        weights=0 padding never enters the likelihood, and the mask keeps
        detection/noise statistics on real pixels only."""
        H, W = hsc["images"].shape[1:]
        crops = [(H, W), (H, W - 8), (H - 8, W)]
        B = len(crops)
        images = np.zeros((B,) + hsc["images"].shape, np.float32)
        variance = np.zeros_like(images)
        weights = np.zeros_like(images)
        valid = np.zeros((B, H, W), np.float32)
        centers, cmask = [], []
        for b, (h, w) in enumerate(crops):
            images[b, :, :h, :w] = hsc["images"][:, :h, :w]
            variance[b, :, :h, :w] = hsc["variance"][:, :h, :w]
            weights[b, :, :h, :w] = hsc["weights"][:, :h, :w]
            valid[b, :h, :w] = 1.0
            cs = [(cy, cx) for cy, cx in hsc["centers"]
                  if cy < h - 3 and cx < w - 3]
            centers.append(cs)
            cmask.append(len(cs))
        K = max(len(c) for c in centers)
        carr = np.zeros((B, K, 2), np.int32)
        cact = np.zeros((B, K), bool)
        for b, cs in enumerate(centers):
            carr[b, :len(cs)] = cs
            cact[b, :len(cs)] = True

        psfs = np.repeat(hsc["psfs"][None], B, axis=0)
        recs, out, losses, aux = stream.deblend_device_stream(
            images, variance, psfs, carr, hsc["model_psf"],
            weights=weights, center_active=cact, scene_valid=valid,
            box_size=59, n_slots=10, max_iter=25, check_every=25)

        # DEFAULT weights must behave identically: 1/variance masked by
        # scene_valid (regression: padding pixels have variance 0 and used
        # to get weight 1e12, blowing up the fit)
        drecs, _, _, _ = stream.deblend_device_stream(
            images, variance, psfs, carr, hsc["model_psf"],
            center_active=cact, scene_valid=valid,
            box_size=59, n_slots=10, max_iter=25, check_every=25)
        for b in range(B):
            np.testing.assert_allclose(drecs[b]["logL"], recs[b]["logL"],
                                       rtol=1e-5)

        # each padded blend must match its own-crop host-path fit
        for b, (h, w) in enumerate(crops):
            obs = lite.LiteObservation(
                hsc["images"][:, :h, :w], hsc["variance"][:, :h, :w],
                hsc["weights"][:, :h, :w], hsc["psfs"],
                model_psf=hsc["model_psf"])
            srcs = lite.init_all_sources_main(obs, centers[b], min_snr=50)
            srcs = lite.parameterize_sources(srcs, obs,
                                             lite.init_adaprox_component)
            bl = lite.LiteBlend(srcs, obs)
            cfg, hdata, hstate = bl.engine_setup(e_rel=1e-4, box_size=59,
                                                 n_slots=10)
            bdata, bstate = parallel.replicate_blend(hdata, hstate, 1)
            hout, _ = parallel.fit_batch_device_converged(
                bstate, bdata, cfg, 25, check_every=25)
            h_logL = float(hout.last_loss[0])
            np.testing.assert_allclose(recs[b]["logL"], h_logL,
                                       rtol=5e-3,
                                       err_msg=f"crop {crops[b]}")


class TestStreamEdgeCases:
    def test_edge_sources_and_single_band(self, hsc):
        """Sources at the image corners/edges and a single-band stack both
        initialize and fit to finite improving losses."""
        rng = np.random.default_rng(9)
        C, H, W = 1, 40, 40
        variance = np.full((C, H, W), 1e-4, np.float32)
        images = (rng.standard_normal((C, H, W)).astype(np.float32)
                  * np.sqrt(variance))
        psf = lite.integrated_circular_gaussian(sigma=1.0).astype(np.float32)
        ph = psf.shape[0] // 2
        # corner source (0,0) and edge source (0, 20): clipped insertion
        for (cy, cx) in ((2, 2), (0, 20), (39, 39)):
            y0, y1 = max(0, cy - ph), min(H, cy + ph + 1)
            x0, x1 = max(0, cx - ph), min(W, cx + ph + 1)
            images[:, y0:y1, x0:x1] += psf[
                y0 - (cy - ph):y1 - (cy - ph),
                x0 - (cx - ph):x1 - (cx - ph)] * 4.0
        psfs = psf[None].repeat(C, axis=0)
        centers = np.asarray([[2, 2], [0, 20], [39, 39]])
        recs, out, losses, aux = stream.deblend_device_stream(
            images[None], variance[None], psfs[None], centers[None],
            lite.integrated_circular_gaussian(sigma=0.6)[None].astype(
                np.float32),
            box_size=21, n_slots=6, max_iter=15, check_every=15)
        assert np.isfinite(recs[0]["logL"])
        assert recs[0]["logL"] > recs[0]["init logL"]
        assert recs[0]["n_components"] >= 3

    def test_single_source_single_slot(self, hsc):
        """K=1 center with n_slots=1 (no split possible) works."""
        rng = np.random.default_rng(10)
        C, H, W = 3, 32, 32
        variance = np.full((C, H, W), 1e-4, np.float32)
        images = (rng.standard_normal((C, H, W)).astype(np.float32)
                  * np.sqrt(variance))
        psf = lite.integrated_circular_gaussian(sigma=1.0).astype(np.float32)
        ph = psf.shape[0] // 2
        images[:, 16 - ph:16 + ph + 1, 16 - ph:16 + ph + 1] += psf * 50.0
        psfs = psf[None].repeat(C, axis=0)
        centers = np.asarray([[16, 16]])
        recs, out, losses, aux = stream.deblend_device_stream(
            images[None], variance[None], psfs[None], centers[None],
            lite.integrated_circular_gaussian(sigma=0.6)[None].astype(
                np.float32),
            box_size=21, n_slots=1, max_iter=10, check_every=10)
        # a bright source wants a bulge/disk split -> 2 components, but
        # only 1 slot exists: overflow flagged, fit still runs
        assert recs[0]["n_components"] == 1
        assert np.isfinite(recs[0]["logL"])


class TestStreamUseMask:
    def test_use_mask_matches_host(self, hsc):
        """use_mask=True (monotonic-mask flood-fill seeds instead of the
        weighted projection) reproduces the host path: bit-equal morphs,
        identical origins/boxes, same fitted logL."""
        obs = lite.LiteObservation(hsc["images"], hsc["variance"],
                                   hsc["weights"], hsc["psfs"],
                                   model_psf=hsc["model_psf"])
        srcs = lite.init_all_sources_main(obs, hsc["centers"], min_snr=50,
                                          use_mask=True)
        srcs = lite.parameterize_sources(srcs, obs,
                                         lite.init_adaprox_component)
        bl = lite.LiteBlend(srcs, obs)
        cfg, hdata, hstate = bl.engine_setup(e_rel=1e-4)
        S = cfg.box_shapes[0][0]
        n_slots = cfg.bucket_counts[0]

        scfg, sdata, sstate, aux = stream.stream_setup(
            hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
            np.asarray(hsc["centers"])[None], hsc["model_psf"],
            box_size=S, n_slots=n_slots, use_mask=True)
        np.testing.assert_array_equal(np.asarray(sstate.origins[0][0]),
                                      np.asarray(hstate.origins[0]))
        np.testing.assert_array_equal(np.asarray(sdata.box_masks[0][0]),
                                      np.asarray(hdata.box_masks[0]))
        np.testing.assert_array_equal(np.asarray(sstate.morphs[0][0]),
                                      np.asarray(hstate.morphs[0]))
        np.testing.assert_allclose(np.asarray(sstate.seds[0][0]),
                                   np.asarray(hstate.seds[0]), rtol=2e-2,
                                   atol=1e-3)

        bdata, bstate = parallel.replicate_blend(hdata, hstate, 1)
        hout, _ = parallel.fit_batch_device_converged(
            bstate, bdata, cfg, 30, check_every=30)
        sout, _ = parallel.fit_batch_device_converged(
            sstate, sdata, scfg, 30, check_every=30)
        np.testing.assert_allclose(float(sout.last_loss[0]),
                                   float(hout.last_loss[0]), rtol=1e-3)


class TestSanitization:
    def test_nonfinite_pixels_do_not_poison(self, hsc):
        """Masked survey pixels arrive as NaN/inf; a NaN data pixel would
        poison the whole fit at ANY weight (0*NaN = NaN in the gradient),
        so stream_setup zeroes bad pixels out of the images and weights
        (with a per-band mean variance fill keeping the init-time noise
        estimates unbiased)."""
        images = np.stack([hsc["images"]] * 3).copy()
        variance = np.stack([hsc["variance"]] * 3).copy()
        psfs = np.stack([hsc["psfs"]] * 3)
        centers = np.stack([np.asarray(hsc["centers"])] * 3)
        # blend 1: NaN data, explicit zero weights there (reference-style
        # masking); blend 2: NaN data + inf variance + a corrupt NEGATIVE
        # variance patch (sqrt would NaN the init noise estimates),
        # default weights
        images[1, :, 10:12, 10:12] = np.nan
        images[2, :, 30:32, 20:22] = np.nan
        variance[2, :, 30:32, 20:22] = np.inf
        variance[2, :, 40:42, 8:10] = -1.0
        weights = 1.0 / np.maximum(variance, 1e-12)
        weights[1, :, 10:12, 10:12] = 0.0

        recs, *_ = parallel.deblend_device_stream(
            images, variance, psfs, centers, hsc["model_psf"],
            weights=weights, box_size=59, n_slots=12, max_iter=10,
            check_every=5)
        recs_default, *_ = parallel.deblend_device_stream(
            images, variance, psfs, centers, hsc["model_psf"],
            box_size=59, n_slots=12, max_iter=10, check_every=5)
        for rs in (recs, recs_default):
            clean = rs[0]["logL"]
            assert np.isfinite(clean)
            for r in rs:
                assert np.isfinite(r["logL"])
                assert np.all(np.isfinite(np.asarray(r["flux"])))
                # same scene minus 4 masked pixels: logL stays close
                assert abs(r["logL"] - clean) < 0.05 * abs(clean)

    def test_out_of_frame_centers_auto_deactivated(self, hsc):
        """Catalog rows outside the frame equal an explicit
        center_active=False mask (the host skip-list analog) instead of
        seeding clamped edge sources."""
        H, W = hsc["images"].shape[1:]
        good = np.asarray(hsc["centers"], np.int32)
        bad = np.array([[-3, 10], [H + 4, W + 9]], np.int32)
        centers = np.concatenate([good, bad])[None]

        auto = stream.stream_setup(
            hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
            centers, hsc["model_psf"], box_size=59, n_slots=12)
        explicit_mask = np.ones(centers.shape[:2], bool)
        explicit_mask[0, len(good):] = False
        explicit = stream.stream_setup(
            hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
            centers, hsc["model_psf"], center_active=explicit_mask,
            box_size=59, n_slots=12)

        _, _, astate, aaux = auto
        _, _, estate, eaux = explicit
        assert int(np.asarray(aaux["n_active"])[0]) == \
            int(np.asarray(eaux["n_active"])[0])
        np.testing.assert_array_equal(np.asarray(astate.comp_active[0]),
                                      np.asarray(estate.comp_active[0]))
        np.testing.assert_array_equal(np.asarray(astate.morphs[0]),
                                      np.asarray(estate.morphs[0]))

    def test_empty_blend_in_batch(self, hsc):
        """A blend whose every center is inert (e.g. a fully out-of-frame
        catalog) fits as an empty model without poisoning the batch."""
        good = np.asarray(hsc["centers"], np.int32)
        centers = np.stack([good, np.full_like(good, -5)])
        ims = np.stack([hsc["images"]] * 2)
        var = np.stack([hsc["variance"]] * 2)
        ps = np.stack([hsc["psfs"]] * 2)
        recs, *_ = parallel.deblend_device_stream(
            ims, var, ps, centers, hsc["model_psf"], box_size=59,
            n_slots=12, max_iter=10, check_every=5)
        # SNR-gated bulge-disk splits can exceed the center count
        assert recs[0]["n_components"] >= len(good)
        assert recs[1]["n_components"] == 0
        assert np.isfinite(recs[0]["logL"]) and np.isfinite(recs[1]["logL"])
        flux1 = np.asarray(recs[1]["flux"])
        assert np.all((flux1 == 0) | np.isnan(flux1))


class TestUploadModes:
    """upload="bulk"/"overlap"/"auto" must be bitwise-identical routes to
    the same programs (the strategy only changes WHEN transfers happen;
    stream.py deblend_device_stream)."""

    def test_upload_modes_bitwise(self):
        rng = np.random.RandomState(0)
        B, C, H, W = 8, 3, 32, 32
        psf = lite.integrated_circular_gaussian(sigma=1.2).astype(np.float32)
        psfs = np.repeat(np.repeat(psf[None], C, 0)[None], B, 0)
        variance = np.full((B, C, H, W), 1e-2, np.float32)
        images = rng.randn(B, C, H, W).astype(np.float32) * 0.05
        ph = psf.shape[0] // 2
        images[:, :, 16 - ph:16 + ph + 1, 16 - ph:16 + ph + 1] += psf * 3.0
        centers = np.tile(np.asarray([[16, 16]], np.int32), (B, 1, 1))
        mp = lite.integrated_circular_gaussian(
            sigma=0.6)[None].astype(np.float32)

        outs = {}
        for mode in ("bulk", "overlap", "auto"):
            rec, _, _, _ = parallel.deblend_device_stream(
                images, variance, psfs, centers, mp, box_size=15,
                n_slots=2, max_iter=6, check_every=3, chunk=3, upload=mode)
            outs[mode] = np.asarray([r["logL"] for r in rec])
        assert np.array_equal(outs["bulk"], outs["overlap"])
        assert np.array_equal(outs["bulk"], outs["auto"])

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError, match="upload mode"):
            parallel.deblend_device_stream(
                np.zeros((2, 1, 16, 16), np.float32),
                np.ones((2, 1, 16, 16), np.float32),
                np.ones((2, 1, 5, 5), np.float32) / 25.0,
                np.zeros((2, 1, 2), np.int32),
                np.ones((1, 5, 5), np.float32) / 25.0,
                box_size=15, n_slots=1, upload="stream")

    def test_bandwidth_probe_warms_full_size(self, monkeypatch):
        """The auto-probe's warmup transfer must be the SAME size as the
        timed one: the tunnel's bulk path only ramps after a >~1 MB
        transfer, and a small warmup leaves the timed put reading the
        ~50 ms one-time ramp (~80 MB/s apparent on a GB/s link), which
        pinned upload="auto" below any bulk threshold (BASELINE r5
        transfer-path mechanism study)."""
        from scarlet_tpu.parallel import stream as stream_mod

        sizes = []
        real_put = jax.device_put

        def spy_put(x, *a, **k):
            sizes.append(np.asarray(x).nbytes)
            return real_put(x, *a, **k)

        monkeypatch.setattr(stream_mod.jax, "device_put", spy_put)
        bw = stream_mod._upload_bandwidth_mbs()
        assert bw > 0
        assert len(sizes) == 2 and sizes[0] == sizes[1]
