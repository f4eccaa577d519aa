"""Display numerics and figure-surface tests.

The RGB pipeline (ref scarlet/display.py) is host-side numpy; with no
astropy in the runtime the self-contained Lupton-style mappings in
scarlet_tpu.display are the production path, so their numerics are
asserted directly here (the examples only smoke them).
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

import scarlet_tpu as st
from scarlet_tpu.display import (
    AsinhMapping, AsinhPercentileNorm, LinearMapping, LinearPercentileNorm,
    channels_to_rgb, img_to_3channel, img_to_rgb)


def test_channels_to_rgb_properties():
    """Each RGB row is a normalized mixture of wavelength-ordered bands
    (ref scarlet/display.py:11-84)."""
    for C in range(1, 8):
        m = channels_to_rgb(C)
        assert m.shape == (3, C)
        assert np.all(m >= 0)
        if C < 7:
            # every display channel integrates ~unit flux (the 7-band
            # table deliberately over-weights, matching the reference)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=2e-3)
    # 3 bands map cleanly onto RGB, reversed (wavelength -> RGB order)
    np.testing.assert_array_equal(channels_to_rgb(3), np.eye(3)[::-1])
    with pytest.raises(AssertionError):
        channels_to_rgb(8)


def test_channels_to_rgb_returns_copy():
    """Callers may normalize/edit the returned map in place (the display
    tutorial does); the cached table must not be corrupted."""
    m = channels_to_rgb(5)
    m[0, :] = 99.0
    assert channels_to_rgb(5)[0, 0] != 99.0


def test_img_to_3channel_is_linear_map():
    rng = np.random.RandomState(0)
    img = rng.rand(5, 8, 9)
    cmap = rng.rand(3, 5)
    out = img_to_3channel(img, channel_map=cmap)
    np.testing.assert_allclose(out, np.einsum("rc,chw->rhw", cmap, img),
                               rtol=1e-12)
    # 2D input is promoted to a single channel
    out2 = img_to_3channel(img[0])
    assert out2.shape == (3, 8, 9)


def test_asinh_mapping_numerics():
    """Gray input: rgb = 255 * asinh(Q I / stretch) / asinh(Q), clipped.
    Matches astropy.visualization.lupton_rgb.AsinhMapping semantics."""
    stretch, Q = 0.1, 10.0
    norm = AsinhMapping(minimum=0, stretch=stretch, Q=Q)
    I = np.array([[0.0, 1e-3, 0.01, 0.1, 1.0, 10.0]])
    rgb = norm.make_rgb_image(I, I, I)
    expected = np.clip(np.arcsinh(Q * I / stretch) / np.arcsinh(Q), 0, 1)
    np.testing.assert_allclose(rgb[..., 0], (expected * 255).astype(np.uint8),
                               atol=1)
    # channels identical for gray input; monotone in intensity
    assert np.all(rgb[..., 0] == rgb[..., 1])
    assert np.all(np.diff(rgb[0, :, 0].astype(int)) >= 0)
    # below the minimum renders black
    norm2 = AsinhMapping(minimum=0.5, stretch=stretch, Q=Q)
    rgb2 = norm2.make_rgb_image(*([np.array([[0.2]])] * 3))
    assert np.all(rgb2 == 0)


def test_asinh_mapping_preserves_hue_at_saturation():
    """Truncation scales by the max channel overflow, so bright pixels
    keep their color ratios instead of washing to white."""
    norm = AsinhMapping(minimum=0, stretch=0.1, Q=10)
    r, g, b = (np.array([[8.0]]), np.array([[4.0]]), np.array([[2.0]]))
    rgb = norm.make_rgb_image(r, g, b).astype(float)[0, 0]
    assert rgb[0] == 255  # brightest channel saturates
    np.testing.assert_allclose(rgb[1] / rgb[0], 0.5, atol=0.01)
    np.testing.assert_allclose(rgb[2] / rgb[0], 0.25, atol=0.01)


def test_linear_mapping_numerics():
    norm = LinearMapping(minimum=1.0, maximum=3.0)
    I = np.array([[0.5, 1.0, 2.0, 3.0, 5.0]])
    rgb = norm.make_rgb_image(I, I, I)
    np.testing.assert_array_equal(rgb[0, :, 0], [0, 0, 127, 255, 255])


def test_percentile_norms():
    rng = np.random.RandomState(1)
    img = rng.rand(5, 30, 30)
    lo, hi = np.percentile(img, (1, 99))
    lin = LinearPercentileNorm(img)
    assert isinstance(lin, LinearMapping)
    np.testing.assert_allclose((lin.minimum, lin.maximum), (lo, hi))
    asinh = AsinhPercentileNorm(img)
    assert isinstance(asinh, AsinhMapping)
    np.testing.assert_allclose(asinh.minimum, lo)
    np.testing.assert_allclose(asinh.stretch, hi - lo)
    np.testing.assert_allclose(asinh.Q, (hi - lo) / np.sinh(1))


def test_img_to_rgb_mask_alpha():
    rng = np.random.RandomState(2)
    img = rng.rand(3, 6, 7)
    mask = np.zeros((6, 7), bool)
    mask[0, :] = True
    rgb = img_to_rgb(img, mask=mask)
    assert rgb.shape == (6, 7, 4)
    assert np.all(rgb[0, :, 3] == 0) and np.all(rgb[1:, :, 3] == 255)
    assert img_to_rgb(img).shape == (6, 7, 3)


@pytest.fixture(scope="module")
def tiny_scene():
    """Two point sources on a 3-band synthetic observation, briefly fit."""
    rng = np.random.RandomState(3)
    C, H, W = 3, 26, 28
    centers = [(9.0, 10.0), (16.0, 18.0)]
    model_frame = st.Frame((C, H, W), channels=list("gri"),
                           psf=st.GaussianPSF(sigma=0.7, boxsize=11))
    psf_obs = st.GaussianPSF(sigma=1.2, boxsize=11)
    images = np.zeros((C, H, W), np.float64)
    psf_img = np.asarray(psf_obs.get_model())[0]
    ph = psf_img.shape[0] // 2
    for (cy, cx), flux in zip(centers, ([3.0, 2.0, 1.0], [1.0, 2.0, 3.0])):
        cy, cx = int(cy), int(cx)
        for c in range(C):
            images[c, cy - ph:cy + ph + 1, cx - ph:cx + ph + 1] += \
                flux[c] * psf_img
    images += rng.randn(C, H, W) * 1e-3
    obs = st.Observation(images, channels=list("gri"), psf=psf_obs,
                         weights=np.full_like(images, 1e4)).match(model_frame)
    sources = [st.PointSource(model_frame, c, obs) for c in centers]
    blend = st.Blend(sources, obs)
    blend.fit(4, e_rel=1e-4)
    return sources, obs, blend


def test_show_scene_panel_surface(tiny_scene):
    sources, obs, _ = tiny_scene
    fig = st.display.show_scene(
        sources, observation=obs, show_model=True, show_rendered=True,
        show_observed=True, show_residual=True, add_boxes=True)
    assert len(fig.axes) == 4
    plt.close(fig)
    fig = st.display.show_scene(sources, add_labels=False)
    assert len(fig.axes) == 1
    plt.close(fig)


def test_show_sources_panel_surface(tiny_scene):
    sources, obs, _ = tiny_scene
    fig = st.display.show_sources(
        sources, observation=obs, show_model=True, show_rendered=True,
        show_observed=True, show_spectrum=True)
    # one row per source, 4 panels each
    assert len(fig.axes) == len(sources) * 4
    plt.close(fig)


def test_show_observation_and_likelihood(tiny_scene):
    sources, obs, blend = tiny_scene
    fig = st.display.show_observation(
        obs, sky_coords=[s.center for s in sources], show_psf=True)
    assert len(fig.axes) == 2
    plt.close(fig)
    fig = st.display.show_likelihood(blend)
    line = fig.axes[0].lines[0]
    assert len(line.get_ydata()) == len(np.asarray(blend.log_likelihood))
    plt.close(fig)
