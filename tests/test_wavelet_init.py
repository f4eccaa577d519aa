"""The lite wavelet initialization recipe on the bundled real HSC blend.

Ref: scarlet/lite/initialization.py:422-605 — bulge seeded from wavelet
scales[:2], disk from scales[2:-1], both monotonic-mask morphologies grown
by 5 pixels, SNR-gated component count, PSF fallback.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scarlet_tpu import lite
from scarlet_tpu.bbox import Box
from scarlet_tpu.detect import get_detect_wavelets
from scarlet_tpu.lite.initialization import (
    WaveletInitParameters,
    init_monotonic_morph,
    init_all_sources_wavelets,
    multifit_seds,
)


@pytest.fixture(scope="module")
def hsc_observation():
    data = np.load("/root/reference/data/hsc_cosmos_35.npz",
                   allow_pickle=True)
    images = data["images"].astype(np.float32)
    variance = data["variance"].astype(np.float32)
    psfs = data["psfs"].astype(np.float32)
    weights = (1.0 / np.maximum(variance, 1e-12)).astype(np.float32)
    model_psf = lite.integrated_circular_gaussian(sigma=0.8)[None].astype(
        np.float32)
    obs = lite.LiteObservation(images, variance, weights, psfs,
                               model_psf=model_psf)
    centers = [(int(np.round(row["y"])), int(np.round(row["x"])))
               for row in data["catalog"]]
    return obs, centers


class TestWaveletInit:
    def test_sources_initialized(self, hsc_observation):
        obs, centers = hsc_observation
        sources = init_all_sources_wavelets(obs, centers, min_snr=50)
        assert len(sources) == len(centers)
        n_null = sum(s.is_null for s in sources)
        assert n_null == 0
        n_two = sum(len(s.components) == 2 for s in sources)
        assert n_two >= 1          # the blend has high-SNR galaxies
        for src in sources:
            for c in src.components:
                sed = np.asarray(c.sed)
                morph = np.asarray(c.morph)
                assert np.all(np.isfinite(sed)) and np.all(sed >= 0)
                assert np.all(np.isfinite(morph))
                assert morph.max() > 0
                # morphologies are max-normalized by init_monotonic_morph
                # except the PSF fallback (also max 1)
                assert np.isclose(morph.max(), 1.0, atol=1e-5)

    def test_scale_slices_and_grow_parity(self, hsc_observation):
        """The bulge/disk morphologies must equal a manual replay of the
        recipe: coadd wavelets[:2] / wavelets[2:-1], monotonic-mask
        morphology about the center, box grown by 5
        (ref lite/initialization.py:422-477, 524-559)."""
        obs, centers = hsc_observation
        wavelets = get_detect_wavelets(
            np.asarray(obs.images), np.asarray(obs.variance), scales=5)
        sources = init_all_sources_wavelets(obs, centers, min_snr=50,
                                            wavelets=wavelets.copy())

        w = np.asarray(wavelets).copy()
        w[w < 0] = 0
        bulgelets = np.sum(w[:2], axis=0)
        disklets = np.sum(w[2:-1], axis=0)

        checked = 0
        for center, src in zip(centers, sources):
            if len(src.components) != 2:
                continue
            bulge, disk = src.components
            bbox_b, morph_b = init_monotonic_morph(
                bulgelets, center, obs.bbox[1:], grow=5)
            bbox_d, morph_d = init_monotonic_morph(
                disklets, center, obs.bbox[1:], grow=5)
            assert bulge.bbox[1:] == bbox_b
            assert disk.bbox[1:] == bbox_d
            np.testing.assert_allclose(np.asarray(bulge.morph), morph_b,
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(disk.morph), morph_d,
                                       rtol=1e-6)
            # the SEDs are the joint least-squares solve over both morphs
            sed_b, sed_d = multifit_seds(
                obs, [morph_b, morph_d], [bbox_b, bbox_d])
            np.testing.assert_allclose(np.asarray(bulge.sed), sed_b,
                                       rtol=1e-5, atol=1e-8)
            np.testing.assert_allclose(np.asarray(disk.sed), sed_d,
                                       rtol=1e-5, atol=1e-8)
            checked += 1
        assert checked >= 1

    def test_low_snr_psf_fallback(self, hsc_observation):
        """min_snr so high every source falls to the PSF morphology
        (ref lite/initialization.py:497-509)."""
        obs, centers = hsc_observation
        sources = init_all_sources_wavelets(obs, centers, min_snr=1e9,
                                            use_psf=True)
        model_psf = np.asarray(obs.model_psf)[0]
        expect = model_psf / model_psf.max()
        for src in sources:
            assert len(src.components) == 1
            c = src.components[0]
            np.testing.assert_allclose(np.asarray(c.morph), expect,
                                       rtol=1e-6)
            assert c.bbox[1:].shape == model_psf.shape

    def test_custom_scale_slices(self, hsc_observation):
        """Non-default bulge/disk slices change the seeds accordingly."""
        obs, centers = hsc_observation
        wavelets = get_detect_wavelets(
            np.asarray(obs.images), np.asarray(obs.variance), scales=5)
        init = WaveletInitParameters(
            obs, bulge_slice=slice(None, 3), disk_slice=slice(3, -1),
            wavelets=wavelets.copy())
        w = np.asarray(wavelets).copy()
        w[w < 0] = 0
        np.testing.assert_allclose(init.bulgelets, np.sum(w[:3], axis=0))
        np.testing.assert_allclose(init.disklets, np.sum(w[3:-1], axis=0))

    def test_fit_from_wavelet_init(self, hsc_observation):
        """The wavelet-initialized blend fits to a sane chi^2 on the real
        data (the lite tutorial's pipeline)."""
        obs, centers = hsc_observation
        sources = init_all_sources_wavelets(obs, centers, min_snr=50)
        sources = lite.parameterize_sources(
            sources, obs, lite.init_adaprox_component)
        blend = lite.LiteBlend(sources, obs)
        it, logL = blend.fit(50, e_rel=1e-4)
        assert it > 5
        losses = np.asarray(blend.loss)
        assert losses[-1] > losses[0]
        model = np.asarray(obs.render(blend.get_model()))
        images = np.asarray(obs.images)
        weights = np.asarray(obs.weights)
        chi2_dof = float(np.mean(weights * (images - model) ** 2))
        assert chi2_dof < 2.5, f"chi2/dof = {chi2_dof}"
