"""Component model tests, mirroring the reference's tests/test_component.py."""
import numpy as np
from numpy.testing import assert_almost_equal, assert_array_equal

import scarlet_tpu as st


class TestCubeComponent:
    def test_model(self):
        frame_shape = (10, 20, 30)
        frame = st.Frame(frame_shape, channels=np.arange(10))

        shape = (5, 4, 6)
        cube = np.zeros(shape)
        on_location = (1, 2, 3)
        cube[on_location] = 1
        cube = st.Parameter(cube, name="cube")
        origin = (2, 3, 4)
        bbox = st.Box(shape, origin=origin)

        component = st.CubeComponent(frame, cube, bbox=bbox)
        model = np.asarray(component.get_model(frame=frame))

        test_loc = tuple(np.array(on_location) + np.array(origin))
        mask = np.zeros(model.shape, dtype=bool)
        mask[test_loc] = True
        assert_array_equal(model[~mask], 0)
        assert model[test_loc] == 1


class TestFactorizedComponent:
    def test_model(self):
        frame_shape = (10, 20, 30)
        frame = st.Frame(frame_shape, channels=np.arange(10))

        shape = (5, 4, 6)
        on_location = (1, 2, 3)
        sed = np.zeros(shape[0])
        sed[on_location[0]] = 1
        morph = np.zeros(shape[1:])
        morph[on_location[1:]] = 1

        origin = (2, 3, 4)
        box = st.Box(shape, origin=origin)
        spectrum = st.TabulatedSpectrum(frame, sed, bbox=box[0])
        morphology = st.ImageMorphology(frame, morph, bbox=box[1:])

        component = st.FactorizedComponent(frame, spectrum, morphology)
        model = np.asarray(component.get_model(frame=frame))

        test_loc = tuple(np.array(on_location) + np.array(origin))
        mask = np.zeros(model.shape, dtype=bool)
        mask[test_loc] = True
        assert_array_equal(model[~mask], 0)
        assert model[test_loc] == 1

        # now with a whole-pixel Fourier shift
        shift_loc = (0, 1, 0)
        shift = st.Parameter(np.array(shift_loc[1:], dtype=float), step=0.1,
                             name="shift")
        morphology = st.ImageMorphology(frame, morph, bbox=box[1:],
                                        shifting=True, shift=shift)
        component = st.FactorizedComponent(frame, spectrum, morphology)
        model = np.asarray(component.get_model(frame=frame))

        test_loc = tuple(np.array(on_location) + np.array(origin)
                         + np.array(shift_loc))
        mask = np.zeros(model.shape, dtype=bool)
        mask[test_loc] = True
        assert_almost_equal(model[~mask], 0)
        assert_almost_equal(model[test_loc], 1)


class TestFunctionComponent:
    def test_model(self):
        frame_shape = (10, 20, 30)
        frame = st.Frame(frame_shape, channels=np.arange(10))

        shape = (5, 4, 6)
        origin = (2, 3, 4)
        box = st.Box(shape, origin=origin)

        on_location = (1, 2, 3)
        sed = np.zeros(shape[0])
        sed[on_location[0]] = 1
        spectrum = st.TabulatedSpectrum(frame, sed, bbox=box[0])

        class OnePixelMorphology(st.Morphology):
            def __init__(self, model_frame, on_pixel, bbox=None):
                self._on_pixel = st.Parameter(on_pixel, step=1,
                                              name="on_pixel")
                super().__init__(model_frame, self._on_pixel, bbox=bbox)

            def get_model(self, *params):
                on_pixel = np.asarray(self.get_parameter(0, *params))
                morph = np.zeros(self.bbox.shape)
                morph[tuple(np.round(on_pixel).astype(int))] = 1
                return morph

        morphology = OnePixelMorphology(
            frame, np.array(on_location[1:], dtype=float), bbox=box[1:])
        component = st.FactorizedComponent(frame, spectrum, morphology)
        model = np.asarray(component.get_model(frame=frame))

        test_loc = tuple(np.array(on_location) + np.array(origin))
        mask = np.zeros(model.shape, dtype=bool)
        mask[test_loc] = True
        assert_array_equal(model[~mask], 0)
        assert model[test_loc] == 1


class TestCombinedComponent:
    def test_model(self):
        frame_shape = (10, 20, 30)
        frame = st.Frame(frame_shape, channels=np.arange(10))

        shape = (5, 4, 6)
        origin = (2, 3, 4)
        box = st.Box(shape, origin=origin)
        on_location1 = (1, 2, 3)
        cube = np.zeros(shape)
        cube[on_location1] = 1
        cube = st.Parameter(cube, name="cube")
        component1 = st.CubeComponent(frame, cube, bbox=box)

        on_location2 = (1, 1, 1)
        sed = np.zeros(shape[0])
        sed[on_location2[0]] = 1
        morph = np.zeros(shape[1:])
        morph[on_location2[1:]] = 1

        spectrum = st.TabulatedSpectrum(frame, sed, bbox=box[0])
        morphology = st.ImageMorphology(frame, morph, bbox=box[1:])
        component2 = st.FactorizedComponent(frame, spectrum, morphology)

        combined = st.CombinedComponent([component1, component2])
        model = np.asarray(combined.get_model(frame=frame))

        test_locs = [
            tuple(np.array(on_location1) + np.array(origin)),
            tuple(np.array(on_location2) + np.array(origin)),
        ]
        mask = np.zeros(model.shape, dtype=bool)
        for test_loc in test_locs:
            mask[test_loc] = True
        assert_array_equal(model[~mask], 0)
        assert_array_equal(model[mask], 1)


class TestProfileMorphologies:
    def test_gaussian(self):
        frame = st.Frame((1, 30, 30), channels=[0])
        morph = st.GaussianMorphology(frame, center=(15.0, 15.0), sigma=2.0)
        model = np.asarray(morph.get_model())
        assert model.max() == model[tuple(
            np.array(model.shape) // 2)]
        # circular: symmetric under transpose
        assert_almost_equal(model, model.T)

    def test_spergel(self):
        from scipy.special import kv as scipy_kv
        from scipy.special import gamma as scipy_gamma

        frame = st.Frame((1, 30, 30), channels=[0])
        morph = st.SpergelMorphology(frame, center=(15.0, 15.0), nu=0.5,
                                     rhalf=3.0)
        model = np.asarray(morph.get_model())
        assert np.all(np.isfinite(model))
        cy, cx = np.array(model.shape) // 2
        assert model[cy, cx] == model.max()

        # check against direct scipy evaluation at a test radius
        nu = 0.5
        z = morph._z
        cnu = z[0] * nu ** 4 + z[1] * nu ** 3 + z[2] * nu ** 2 + \
            z[3] * nu + z[4]
        R2 = (5.0 / 3.0) ** 2  # r=5 at rhalf=3
        x = np.sqrt(R2 + 1e-4) * cnu
        expected = (x / 2) ** nu * scipy_kv(nu, x) / scipy_gamma(nu + 1)
        got = model[cy + 5, cx]
        assert_almost_equal(got, expected, decimal=8)
