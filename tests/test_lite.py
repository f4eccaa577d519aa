"""End-to-end tests of the lite (fast path) deblender on the bundled
simulated blend, the acceptance gate of SURVEY.md §7.3."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import scarlet_tpu as st
from scarlet_tpu import lite


def load_sim():
    data = np.load("/root/reference/data/psf_matched_sim.npz")
    images = data["images"].astype(np.float32)
    psfs = data["psfs"].astype(np.float32)
    catalog = data["catalog"]
    # noise variance per band via median absolute deviation (robust to
    # sources); the sim has stationary Gaussian noise
    sigma = np.array([
        1.4826 * np.median(np.abs(im - np.median(im))) for im in images
    ])
    variance = np.ones_like(images) * (sigma ** 2)[:, None, None]
    weights = 1.0 / variance
    return images, variance, weights, psfs, catalog


@pytest.fixture(scope="module")
def sim_observation():
    images, variance, weights, psfs, catalog = load_sim()
    # The sim images are already PSF-homogenized to a near-delta PSF
    # (rms radius ~0.7 px), so the model frame PSF must be narrower still
    # for the difference kernel to be well-posed.
    model_psf = lite.integrated_circular_gaussian(sigma=0.3)[None].astype(
        np.float32)
    obs = lite.LiteObservation(images, variance, weights, psfs,
                               model_psf=model_psf)
    centers = [(int(np.round(row["y"])), int(np.round(row["x"])))
               for row in catalog]
    return obs, centers, catalog


class TestLiteEndToEnd:
    def test_init_all_sources_main(self, sim_observation):
        obs, centers, catalog = sim_observation
        sources = lite.init_all_sources_main(obs, centers, min_snr=50)
        assert len(sources) == len(centers)
        assert all(not s.is_null for s in sources)
        for src in sources:
            for c in src.components:
                assert np.all(np.isfinite(np.asarray(c.sed)))
                assert np.all(np.isfinite(np.asarray(c.morph)))
                assert np.asarray(c.morph).max() > 0

    def test_fit_converges(self, sim_observation):
        obs, centers, catalog = sim_observation
        sources = lite.init_all_sources_main(obs, centers, min_snr=50)
        sources = lite.parameterize_sources(
            sources, obs, lite.init_adaprox_component)
        blend = lite.LiteBlend(sources, obs)

        it, logL = blend.fit(100, e_rel=1e-4, resize=None)
        losses = np.array(blend.loss)
        assert len(losses) == it
        # logL must improve substantially from initialization
        assert losses[-1] > losses[0]
        # late iterations approximately monotonic (adaprox oscillates at the
        # sub-percent level near convergence)
        assert np.all(np.diff(losses[-10:]) > -abs(losses[-1]) * 1e-2)

        # The final model should explain the data to near the noise level:
        # chi^2 per dof close to 1
        model = np.asarray(obs.convolve(blend.get_model()))
        chi2_dof = float(np.mean(
            np.asarray(obs.weights) * (np.asarray(obs.images) - model) ** 2))
        # MAD-based weights overestimate sigma slightly, so an excellent fit
        # reads below 1 here; anything < 1.2 means residuals ~ noise
        assert chi2_dof < 1.2, f"chi2/dof = {chi2_dof}"

        # per-source flux vs truth (weight_sources redistributed flux);
        # heavily blended neighbors trade some flux, totals are tight
        ratios = []
        for src, row in zip(blend.sources, catalog):
            truth_flux = sum(row[f"intensity_{band}"].sum()
                             for band in "ugrizy")
            got_flux = float(np.asarray(src.flux).sum())
            ratios.append(got_flux / truth_flux)
            assert 0.5 < got_flux / truth_flux < 1.6, (
                f"flux ratio {got_flux / truth_flux} at {src.center}")
        total_truth = sum(
            sum(row[f"intensity_{band}"].sum() for band in "ugrizy")
            for row in catalog)
        total_got = sum(float(np.asarray(src.flux).sum())
                        for src in blend.sources)
        assert abs(total_got - total_truth) / total_truth < 0.1

    def test_fit_with_resize(self, sim_observation):
        obs, centers, catalog = sim_observation
        sources = lite.init_all_sources_main(obs, centers, min_snr=50)
        sources = lite.parameterize_sources(
            sources, obs, lite.init_adaprox_component)
        blend = lite.LiteBlend(sources, obs)
        it, logL = blend.fit(30, e_rel=1e-4, resize=10)
        assert np.isfinite(logL)
        assert it > 0

    def test_real_vs_fft_convolution(self, sim_observation):
        obs, _, _ = sim_observation
        rng = np.random.RandomState(0)
        img = rng.rand(obs.n_bands, *obs.shape[1:]).astype(np.float32)
        fftd = np.asarray(obs.convolve(img, mode="fft"))
        real = np.asarray(obs.convolve(img, mode="real"))
        # interior must agree (boundary handling differs by padding)
        k = obs.psfs.shape[-1] // 2
        np.testing.assert_allclose(
            fftd[:, k:-k, k:-k], real[:, k:-k, k:-k], rtol=1e-3, atol=1e-4)


class TestEngineF32VsF64:
    def test_f32_engine_tracks_f64_oracle(self, sim_observation):
        """The production engine runs f32 on TPU; the tests otherwise run
        f64. Guard the shipped numerics: an f32 fit segment must track the
        f64 oracle's loss trajectory to ~1e-4 relative."""
        import jax
        import jax.numpy as jnp
        from scarlet_tpu.lite import engine

        obs, centers, catalog = sim_observation
        sources = lite.init_all_sources_main(obs, centers, min_snr=50)
        sources = lite.parameterize_sources(
            sources, obs, lite.init_adaprox_component)
        blend = lite.LiteBlend(sources, obs)
        # disable the e_rel stop: the |dL| < e_rel |L| cutoff fires at
        # different iterations in f32 vs f64 (a hard rule amplifies tiny
        # loss noise into a different stop point), which is legitimate but
        # makes trajectories incomparable after one of them freezes
        config, data, state = blend.engine_setup(e_rel=0.0)

        def cast(tree, dtype):
            return jax.tree.map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                          jnp.floating)
                else x, tree)

        n = 150
        _, losses32 = engine.fit_scan(cast(state, jnp.float32),
                                      cast(data, jnp.float32), config, n)
        _, losses64 = engine.fit_scan(cast(state, jnp.float64),
                                      cast(data, jnp.float64), config, n)
        l32 = np.asarray(losses32, np.float64)
        l64 = np.asarray(losses64, np.float64)
        assert np.all(np.isfinite(l32)) and np.all(np.isfinite(l64))
        rel = np.abs(l32 - l64) / np.abs(l64)
        # early descent may diverge by a few % (hard-threshold prox switches
        # amplify rounding); late fit must track to ~1e-3
        assert rel[-1] < 2e-3, f"f32 final loss drifts from f64: {rel[-1]}"
        assert rel[n // 3:].max() < 5e-3, (
            f"f32 late-fit drift: {rel[n // 3:].max()}")
        assert rel.max() < 5e-2, f"f32 diverges mid-fit: max rel {rel.max()}"


class TestFistaEngine:
    def test_fista_fit(self, sim_observation):
        obs, centers, catalog = sim_observation
        sources = lite.init_all_sources_main(obs, centers, min_snr=50)
        sources = lite.parameterize_sources(
            sources, obs, lite.init_fista_component)
        blend = lite.LiteBlend(sources, obs)
        it, logL = blend.fit(100, e_rel=1e-4, resize=None)
        losses = np.array(blend.loss)
        assert losses[-1] > losses[0]
        model = np.asarray(obs.convolve(blend.get_model()))
        chi2_dof = float(np.mean(
            np.asarray(obs.weights) * (np.asarray(obs.images) - model) ** 2))
        assert chi2_dof < 1.5, f"FISTA chi2/dof = {chi2_dof}"


def test_lite_display_smoke(sim_observation):
    """Lite display: show_scene / show_sources / compare_spectra render
    without error on a fitted blend (matplotlib Agg)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scarlet_tpu.lite import display as ldisplay

    obs, centers, catalog = sim_observation
    sources = lite.init_all_sources_main(obs, centers, min_snr=50)
    sources = lite.parameterize_sources(
        sources, obs, lite.init_adaprox_component)
    blend = lite.LiteBlend(sources, obs)
    blend.fit(5, e_rel=1e-4, resize=None)

    fig = ldisplay.show_scene(blend, show_model=True, show_rendered=True,
                              show_observed=True, show_residual=True)
    assert fig is not None
    plt.close(fig)
    fig = ldisplay.show_sources(blend, sources=blend.sources[:2],
                                show_model=True, show_rendered=True,
                                show_observed=True)
    assert fig is not None
    plt.close(fig)
    # one kwarg per deblending run, each a full source list
    fig = ldisplay.compare_spectra(run1=blend.sources, run2=blend.sources)
    assert fig is not None
    plt.close("all")
