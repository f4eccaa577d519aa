"""End-to-end main-path fit: init_all_sources + Blend.fit on the bundled
simulated blend (the scarlet-main pipeline, SURVEY.md §3.3)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import scarlet_tpu as st


@pytest.fixture(scope="module")
def sim_setup():
    data = np.load("/root/reference/data/psf_matched_sim.npz")
    images = data["images"].astype(np.float32)
    psfs = data["psfs"].astype(np.float32)
    catalog = data["catalog"]
    sigma = np.array([
        1.4826 * np.median(np.abs(im - np.median(im))) for im in images
    ])
    weights = np.ones_like(images) / (sigma ** 2)[:, None, None]
    channels = [f.decode() if isinstance(f, bytes) else str(f)
                for f in data["filters"]]

    model_psf = st.GaussianPSF(sigma=0.4, boxsize=15)
    model_frame = st.Frame(images.shape, channels=channels, psf=model_psf)
    observation = st.Observation(images, psf=st.ImagePSF(psfs),
                                 weights=weights, channels=channels)
    observation.match(model_frame)

    centers = [(float(row["y"]), float(row["x"])) for row in catalog]
    return model_frame, observation, centers, catalog


class TestMainBlend:
    def test_init_all_sources(self, sim_setup):
        model_frame, observation, centers, catalog = sim_setup
        sources, skipped = st.initialization.init_all_sources(
            model_frame, centers, observation, max_components=2, min_snr=50,
            silent=True)
        assert len(sources) + len(skipped) == len(centers)
        assert len(sources) >= 5
        for src in sources:
            model = np.asarray(src.get_model(frame=model_frame))
            assert np.all(np.isfinite(model))
            assert model.sum() > 0

    def test_fit(self, sim_setup):
        model_frame, observation, centers, catalog = sim_setup
        sources, skipped = st.initialization.init_all_sources(
            model_frame, centers, observation, max_components=1, min_snr=50,
            silent=True)
        blend = st.Blend(sources, observation)
        it, logL = blend.fit(50, e_rel=1e-4)
        assert it > 1
        logLs = blend.log_likelihood
        assert logLs[-1] > logLs[0]

        # residuals near the noise level
        model = np.asarray(observation.render(blend.get_model()))
        images = np.asarray(observation.data)
        weights = np.asarray(observation.weights)
        chi2_dof = float(np.mean(weights * (images - model) ** 2))
        assert chi2_dof < 2.0, f"chi2/dof = {chi2_dof}"

    def test_fit_segmented_matches_per_iteration(self, sim_setup):
        """The segment-scan fit (default segment=10) must reproduce the
        per-iteration (segment=1) iterate sequence exactly: the device-side
        convergence mask is evaluated at the same points with the same
        floats."""
        model_frame, observation, centers, catalog = sim_setup

        def run(segment):
            sources, _ = st.initialization.init_all_sources(
                model_frame, centers, observation, max_components=1,
                min_snr=50, silent=True)
            blend = st.Blend(sources, observation)
            it, logL = blend.fit(35, e_rel=1e-4, segment=segment)
            return it, np.asarray(blend.loss)

        it1, loss1 = run(1)
        it10, loss10 = run(10)
        assert it1 == it10
        np.testing.assert_allclose(loss1, loss10, rtol=0, atol=0)

    def test_point_source(self, sim_setup):
        model_frame, observation, centers, catalog = sim_setup
        stars = [row for row in catalog if row["is_star"]]
        src = st.PointSource(model_frame,
                             (float(stars[0]["y"]), float(stars[0]["x"])),
                             observation)
        model = np.asarray(src.get_model(frame=model_frame))
        assert np.all(np.isfinite(model))
        assert model.sum() > 0

    def test_source_classes(self, sim_setup):
        model_frame, observation, centers, catalog = sim_setup
        coord = centers[0]
        for make in [
            lambda: st.CompactExtendedSource(model_frame, coord, observation),
            lambda: st.GaussianSource(model_frame, coord, 1.5, (0.0, 0.0),
                                      observation),
            lambda: st.SpergelSource(model_frame, coord, 0.5, 2.0, (0.0, 0.0),
                                     observation),
            lambda: st.StarletSource(model_frame, coord, observation),
            lambda: st.NullSource(model_frame),
        ]:
            src = make()
            model = np.asarray(src.get_model(frame=model_frame))
            assert np.all(np.isfinite(model)), type(src)
