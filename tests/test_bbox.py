"""Box semantics tests, mirroring the reference's tests/test_bbox.py."""
import numpy as np

import scarlet_tpu as st


class TestBox:
    def test_from_data(self):
        x = np.arange(25).reshape(5, 5)
        x[0] = 0
        x[:, -2:] = 0
        bbox = st.Box.from_data(x)
        assert bbox == st.Box((4, 3), origin=(1, 0))

        x += 10
        bbox = st.Box.from_data(x)
        assert bbox == st.Box((5, 5), origin=(0, 0))

        bbox = st.Box.from_data(x, min_value=10)
        assert bbox == st.Box((4, 3), origin=(1, 0))

    def test_contains(self):
        bbox = st.Box((6, 4, 3), origin=(0, 1, 0))
        assert bbox.contains((2, 2, 2))
        assert not bbox.contains((3, 0, 3))
        assert not bbox.contains((7, 3, 3))
        assert not bbox.contains((3, 3, -1))

    def test_extract_from(self):
        image = np.zeros((3, 5, 5))
        image[1, 1, 1] = 1

        bbox = st.Box.from_data(image)
        extracted = bbox.extract_from(image)
        assert extracted.shape == (1, 1, 1) and extracted[0, 0, 0] == 1

        bbox = st.Box.from_bounds((0, 3), (-2, 3), (-3, 2))
        extracted = bbox.extract_from(image)
        assert extracted.shape == (3, 5, 5) and extracted[1, 3, 4] == 1

    def test_insert_into(self):
        image = np.zeros((3, 5, 5))
        sub = np.zeros((3, 5, 5))
        sub[1, 3, 4] = 1
        bbox = st.Box.from_bounds((0, 3), (-2, 3), (-3, 2))
        image = bbox.insert_into(image, sub)
        assert image.shape == (3, 5, 5) and image[1, 1, 1] == 1

    def test_algebra(self):
        a = st.Box((3, 4), origin=(1, 2))
        b = st.Box((2, 2), origin=(0, 5))
        union = a | b
        assert union == st.Box((4, 5), origin=(0, 2))
        inter = a & b
        assert inter == st.Box((1, 1), origin=(1, 5))

        grown = a.grow(2)
        assert grown == st.Box((7, 8), origin=(-1, 0))

        # outer product: channel box @ spatial box
        cbox = st.Box((5,))
        full = cbox @ a
        assert full == st.Box((5, 3, 4), origin=(0, 1, 2))

        shifted = a + (1, 1)
        assert shifted == st.Box((3, 4), origin=(2, 3))

    def test_overlapped_slices(self):
        b1 = st.Box((5, 5), origin=(0, 0))
        b2 = st.Box((3, 3), origin=(3, 3))
        s1, s2 = st.overlapped_slices(b1, b2)
        assert s1 == (slice(3, 5), slice(3, 5))
        assert s2 == (slice(0, 2), slice(0, 2))

        img = np.zeros((5, 5))
        sub = np.ones((3, 3))
        img[s1] = sub[s2]
        assert img.sum() == 4
