"""Observation rendering and likelihood tests, mirroring the reference's
tests/test_observation.py."""
import numpy as np
from numpy.testing import assert_almost_equal

import scarlet_tpu as st


class TestObservation:
    def test_render_loss(self):
        # model frame with minimal PSF
        shape0 = (3, 13, 13)
        s0 = 0.9
        model_psf = st.GaussianPSF(s0, boxsize=shape0[1])
        model_psf_image = np.asarray(model_psf.get_model())

        shape = (3, 43, 43)
        channels = np.arange(shape[0])
        model_frame = st.Frame(shape, psf=model_psf, channels=channels)

        # insert a point source (= model PSF) into the scene center
        origin = (0, shape[1] // 2 - shape0[1] // 2,
                  shape[2] // 2 - shape0[2] // 2)
        bbox = st.Box(shape0, origin=origin)
        model = np.zeros(shape)
        box = np.stack([model_psf_image[0] for _ in range(shape[0])], axis=0)
        bbox.insert_into(model, box)

        # observation with wider, per-band PSFs
        psf = st.GaussianPSF([2.1, 1.1, 3.5], boxsize=shape[1])
        psf_image = np.asarray(psf.get_model())
        images = np.ones(shape)
        observation = st.Observation(images, psf=psf, channels=channels)
        observation.match(model_frame)

        # rendering the model point source reproduces the observation PSF
        model_ = np.asarray(observation.render(model))
        assert_almost_equal(model_, psf_image)

        # exact logL value
        weights = 1
        log_norm = (
            np.prod(images.shape) / 2 * np.log(2 * np.pi)
            + np.sum(np.log(1 / weights)) / 2
        )
        true_loss = log_norm + np.sum(weights * (model_ - images) ** 2) / 2
        assert_almost_equal(
            float(observation.get_log_likelihood(model)), -true_loss,
            decimal=4)
