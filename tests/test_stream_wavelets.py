"""Device-stream wavelet initialization vs the host recipe
(lite/initialization.py:422-605): same discrete decisions, seeds, and fit
result on the bundled real HSC blend."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

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
    srcs = lite.init_all_sources_wavelets(obs, hsc["centers"], min_snr=50)
    srcs_p = lite.parameterize_sources(srcs, obs,
                                       lite.init_adaprox_component)
    blend = lite.LiteBlend(srcs_p, obs)
    return srcs, blend, blend.engine_setup(e_rel=1e-4)


@pytest.fixture(scope="module")
def stream_setup_out(hsc, host_setup):
    _, _, (cfg, _, _) = host_setup
    S = cfg.box_shapes[0][0]
    n_slots = cfg.bucket_counts[0]
    return stream.stream_setup(
        hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
        np.asarray(hsc["centers"])[None], hsc["model_psf"],
        box_size=S, n_slots=n_slots, recipe="wavelets")


class TestStreamWaveletInit:
    def test_layout_matches_host(self, host_setup, stream_setup_out):
        """Slot origins, actives, and logical box masks equal the host
        wavelet recipe exactly."""
        srcs, blend, (cfg, hdata, hstate) = host_setup
        scfg, sdata, sstate, aux = stream_setup_out
        assert not bool(np.asarray(aux["overflow"])[0])
        np.testing.assert_array_equal(np.asarray(sstate.origins[0][0]),
                                      np.asarray(hstate.origins[0]))
        np.testing.assert_array_equal(np.asarray(sstate.comp_active[0][0]),
                                      np.asarray(hstate.comp_active[0]))
        np.testing.assert_array_equal(np.asarray(sdata.box_masks[0][0]),
                                      np.asarray(hdata.box_masks[0]))

    def test_seeds_match_host(self, host_setup, stream_setup_out):
        _, _, (cfg, hdata, hstate) = host_setup
        scfg, sdata, sstate, aux = stream_setup_out
        hseds = np.asarray(hstate.seds[0])
        sseds = np.asarray(sstate.seds[0][0])
        np.testing.assert_allclose(sseds, hseds,
                                   rtol=2e-2, atol=1e-3 * hseds.max())
        hm = np.asarray(hstate.morphs[0])
        sm = np.asarray(sstate.morphs[0][0])
        np.testing.assert_allclose(sm, hm, atol=2e-2)

    def test_split_gating_matches_host(self, host_setup, stream_setup_out):
        srcs, _, _ = host_setup
        _, _, _, aux = stream_setup_out
        host_two = np.array([len(s.components) == 2 for s in srcs])
        np.testing.assert_array_equal(np.asarray(aux["split"][0]), host_two)
        host_null = np.array([len(s.components) == 0 for s in srcs])
        assert not host_null.any()

    def test_fit_parity(self, host_setup, stream_setup_out):
        """Fitting from the device wavelet init reaches the host-init
        result: logL within 0.5%."""
        _, _, (cfg, hdata, hstate) = host_setup
        scfg, sdata, sstate, aux = stream_setup_out
        bdata, bstate = parallel.replicate_blend(hdata, hstate, 1)
        hout, _ = parallel.fit_batch_device_converged(
            bstate, bdata, cfg, 50, check_every=25)
        sout, slosses = parallel.fit_batch_device_converged(
            sstate, sdata, scfg, 50, check_every=25)
        h_logL = float(hout.last_loss[0])
        s_logL = float(sout.last_loss[0])
        assert abs(s_logL - h_logL) < 5e-3 * abs(h_logL)

    def test_psf_fallback_at_high_min_snr(self, hsc, host_setup):
        """min_snr high enough that every source takes the PSF branch."""
        _, _, (cfg, _, _) = host_setup
        S = cfg.box_shapes[0][0]
        scfg, sdata, sstate, aux = stream.stream_setup(
            hsc["images"][None], hsc["variance"][None], hsc["psfs"][None],
            np.asarray(hsc["centers"])[None], hsc["model_psf"],
            box_size=S, n_slots=cfg.bucket_counts[0], recipe="wavelets",
            min_snr=1e9)
        assert np.asarray(aux["psf_fallback"][0]).all()
        assert not np.asarray(aux["split"][0]).any()
        K = len(hsc["centers"])
        assert int(np.asarray(aux["n_active"])[0]) == K
