"""Parametric-source optimization: fitting Gaussian and Spergel profiles
recovers known injected parameters (exercises gradients through profile
centers/radii/ellipticities and the quadrature Bessel-K JVP)."""
import numpy as np
from numpy.testing import assert_allclose

import scarlet_tpu as st


def make_gaussian_scene(sigma_true=2.2, center=(20.3, 21.7), flux=200.0):
    shape = (3, 41, 41)
    channels = list("abc")
    model_psf = st.GaussianPSF(sigma=0.7, boxsize=11)
    model_frame = st.Frame(shape, channels=channels, psf=model_psf)

    # truth: flux-scaled Gaussian morphology convolved with a wider obs PSF
    obs_sigma = 1.2
    yy, xx = np.mgrid[0:41, 0:41]
    sig_tot2 = sigma_true ** 2 + obs_sigma ** 2 - 0.7 ** 2
    # observed = deconvolved-model gaussian (sigma_true^2 + model_psf^2
    # appears in the model's rendered width); build the observed image
    # directly at total width sigma_true^2 + obs_sigma^2... for the fit we
    # only need a consistent forward model, so render the truth through the
    # same pipeline instead:
    spectrum_true = flux * np.array([0.2, 0.5, 0.3])

    obs_psf = st.GaussianPSF(sigma=obs_sigma, boxsize=21)
    morph = st.GaussianMorphology(model_frame, center=center,
                                  sigma=sigma_true, boxsize=31)
    spec = st.TabulatedSpectrum(model_frame, spectrum_true / morph.integral)
    src_true = st.FactorizedComponent(model_frame, spec, morph)

    images = np.zeros(shape, np.float32)
    obs = st.Observation(images, psf=obs_psf, channels=channels,
                         weights=np.full(shape, 25.0, np.float32))
    obs.match(model_frame)
    truth_img = np.asarray(obs.render(src_true.get_model(frame=model_frame)))
    obs.data = st.ops.fft.jnp.asarray(truth_img)
    return model_frame, obs, spectrum_true, sigma_true, center


class TestProfileFits:
    def test_gaussian_source_recovers_sigma(self):
        model_frame, obs, spectrum_true, sigma_true, center = \
            make_gaussian_scene()

        src = st.GaussianSource(model_frame, center, sigma=1.5,
                                ellipticity=(0.0, 0.0), observations=obs)
        blend = st.Blend([src], obs)
        it, logL = blend.fit(150, e_rel=1e-8)

        fitted_sigma = float(np.asarray(src.get_parameter("radius"))[0])
        assert_allclose(fitted_sigma, sigma_true, rtol=0.05)

        fitted_center = np.asarray(src.get_parameter("center"))
        assert_allclose(fitted_center, center, atol=0.1)

        # rendered model matches the noiseless data closely
        model = np.asarray(obs.render(blend.get_model()))
        resid = np.abs(model - np.asarray(obs.data)).max()
        assert resid < 0.02 * np.asarray(obs.data).max()

    def test_spergel_source_optimizes(self):
        model_frame, obs, spectrum_true, sigma_true, center = \
            make_gaussian_scene()

        src = st.SpergelSource(model_frame, center, nu=0.5, rhalf=2.0,
                               ellipticity=(0.0, 0.0), observations=obs)
        blend = st.Blend([src], obs)
        it, logL = blend.fit(60, e_rel=1e-8)
        logLs = blend.log_likelihood
        # Spergel profile fitting a Gaussian target: logL must improve and
        # parameters must stay in bounds
        assert logLs[-1] > logLs[0]
        nu = float(np.asarray(src.get_parameter("nu"))[0])
        assert -0.85 <= nu <= 4.0
        rhalf = float(np.asarray(src.get_parameter("radius"))[0])
        assert rhalf > 0
