"""Visualization: RGB mapping and scene/source plotting (host-side,
matplotlib + astropy Lupton norms).

Behavioral reference: scarlet/display.py.
"""
from __future__ import annotations

import numpy as np

from .bbox import Box

__all__ = [
    "channels_to_rgb",
    "LinearPercentileNorm",
    "AsinhPercentileNorm",
    "img_to_3channel",
    "img_to_rgb",
    "show_likelihood",
    "show_observation",
    "show_scene",
    "show_sources",
    "get_extent",
]

panel_size = 4.0

# fixed wavelength-ordered channel -> RGB weight tables for 1..7 channels
# (ref: scarlet/display.py:11-84)
_RGB_MAPS = {}


def channels_to_rgb(channels):
    """Linear (3, channels) map of wavelength-ordered channels onto RGB.

    Ref: scarlet/display.py:11-84.
    """
    assert channels in range(0, 8), \
        f"No mapping has been implemented for {channels} channels"
    if channels in _RGB_MAPS:
        return _RGB_MAPS[channels].copy()

    channel_map = np.zeros((3, channels))
    if channels == 1:
        channel_map[:, 0] = 1
    elif channels == 2:
        channel_map[0, 1] = 0.667
        channel_map[1, 1] = 0.333
        channel_map[1, 0] = 0.333
        channel_map[2, 0] = 0.667
        channel_map /= 0.667
    elif channels == 3:
        channel_map[0, 2] = 1
        channel_map[1, 1] = 1
        channel_map[2, 0] = 1
    elif channels == 4:
        channel_map[0, 3] = 1
        channel_map[0, 2] = 0.333
        channel_map[1, 2] = 0.667
        channel_map[1, 1] = 0.667
        channel_map[2, 1] = 0.333
        channel_map[2, 0] = 1
        channel_map /= 1.333
    elif channels == 5:
        channel_map[0, 4] = 1
        channel_map[0, 3] = 0.667
        channel_map[1, 3] = 0.333
        channel_map[1, 2] = 1
        channel_map[1, 1] = 0.333
        channel_map[2, 1] = 0.667
        channel_map[2, 0] = 1
        channel_map /= 1.667
    elif channels == 6:
        channel_map[0, 5] = 1
        channel_map[0, 4] = 0.667
        channel_map[0, 3] = 0.333
        channel_map[1, 4] = 0.333
        channel_map[1, 3] = 0.667
        channel_map[1, 2] = 0.667
        channel_map[1, 1] = 0.333
        channel_map[2, 2] = 0.333
        channel_map[2, 1] = 0.667
        channel_map[2, 0] = 1
        channel_map /= 2
    elif channels == 7:
        channel_map[:, 6] = 2 / 3.0
        channel_map[0, 5] = 1
        channel_map[0, 4] = 0.667
        channel_map[0, 3] = 0.333
        channel_map[1, 4] = 0.333
        channel_map[1, 3] = 0.667
        channel_map[1, 2] = 0.667
        channel_map[1, 1] = 0.333
        channel_map[2, 2] = 0.333
        channel_map[2, 1] = 0.667
        channel_map[2, 0] = 1
        channel_map /= 2
    _RGB_MAPS[channels] = channel_map
    return channel_map.copy()


class _Mapping:
    """Self-contained Lupton-style intensity mapping (API-compatible subset
    of astropy.visualization.lupton_rgb mappings; used directly when astropy
    is unavailable in the runtime)."""

    def __init__(self, minimum=None, image=None):
        self.minimum = minimum

    def intensity(self, image_r, image_g, image_b):
        return (image_r + image_g + image_b) / 3.0

    def _scale(self, I):
        raise NotImplementedError

    def make_rgb_image(self, image_r, image_g, image_b):
        image_r = np.asarray(image_r, dtype=float)
        image_g = np.asarray(image_g, dtype=float)
        image_b = np.asarray(image_b, dtype=float)
        I = self.intensity(image_r, image_g, image_b)
        fac = self._scale(I)
        rgb = np.stack([image_r * fac, image_g * fac, image_b * fac], axis=-1)
        # truncate while preserving hue: scale by the max channel overflow
        peak = rgb.max(axis=-1)
        with np.errstate(invalid="ignore", divide="ignore"):
            scale = np.where(peak > 1, 1.0 / np.where(peak > 0, peak, 1), 1.0)
        rgb = rgb * scale[..., None]
        rgb = np.clip(rgb, 0, 1)
        return (rgb * 255).astype(np.uint8)


class LinearMapping(_Mapping):
    """Linear stretch between minimum and maximum."""

    def __init__(self, minimum=None, maximum=None, image=None):
        if image is not None and (minimum is None or maximum is None):
            minimum = np.min(image) if minimum is None else minimum
            maximum = np.max(image) if maximum is None else maximum
        super().__init__(minimum=minimum)
        self.maximum = maximum

    def _scale(self, I):
        rng = self.maximum - self.minimum
        rng = rng if rng > 0 else 1.0
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(I > self.minimum,
                            (np.clip((I - self.minimum) / rng, 0, 1))
                            / np.where(I != 0, I, 1),
                            0.0)


class AsinhMapping(_Mapping):
    """asinh stretch: f(I) = asinh(Q (I-min)/stretch) / Q."""

    def __init__(self, minimum=0, stretch=1, Q=8, image=None):
        super().__init__(minimum=minimum)
        self.stretch = stretch
        self.Q = Q

    def _scale(self, I):
        Q = max(self.Q, 1e-10)
        frac = (I - self.minimum) / self.stretch
        with np.errstate(invalid="ignore", divide="ignore"):
            f = np.arcsinh(Q * frac) / np.arcsinh(Q)
            return np.where(I > self.minimum,
                            np.clip(f, 0, 1) / np.where(I != 0, I, 1), 0.0)


def _lupton():
    """Prefer astropy's reference implementations when present."""
    try:
        from astropy.visualization.lupton_rgb import (
            LinearMapping as _LM, AsinhMapping as _AM)
        return _LM, _AM
    except ImportError:
        return LinearMapping, AsinhMapping


class LinearPercentileNorm:
    """Linear norm between image percentiles. Ref: display.py:87-100."""

    def __new__(cls, img, percentiles=(1, 99)):
        LM, _ = _lupton()
        assert len(percentiles) == 2
        vmin, vmax = np.percentile(img, percentiles)
        return LM(minimum=vmin, maximum=vmax)


class AsinhPercentileNorm:
    """Asinh norm between image percentiles. Ref: display.py:103-119."""

    def __new__(cls, img, percentiles=(1, 99)):
        _, AM = _lupton()
        assert len(percentiles) == 2
        vmin, vmax = np.percentile(img, percentiles)
        stretch = vmax - vmin
        beta = stretch / np.sinh(1)
        return AM(minimum=vmin, stretch=stretch, Q=beta)


def img_to_3channel(img, channel_map=None, fill_value=0):
    """Project a (C, H, W) cube onto 3 RGB planes. Ref: display.py:122-158."""
    img = np.asarray(img)
    assert img.ndim in (2, 3)
    if img.ndim == 2:
        img = img[None]
    C = len(img)
    if channel_map is None:
        channel_map = channels_to_rgb(C)
    else:
        assert channel_map.shape == (3, len(img))
    _, ny, nx = img.shape
    rgb = np.dot(channel_map, img.reshape(C, -1)).reshape(3, ny, nx)
    if hasattr(rgb, "mask"):
        rgb = rgb.filled(fill_value)
    return rgb


def img_to_rgb(img, channel_map=None, fill_value=0, norm=None, mask=None):
    """(C, H, W) cube -> uint8 RGB image. Ref: display.py:161-189."""
    LM, _ = _lupton()
    RGB = img_to_3channel(img, channel_map=channel_map)
    if norm is None:
        norm = LM(image=RGB)
    rgb = norm.make_rgb_image(*RGB)
    if mask is not None:
        rgb = np.dstack([rgb, ~mask * 255])
    return rgb


def get_extent(bbox):
    return [bbox.start[-1], bbox.stop[-1], bbox.start[-2], bbox.stop[-2]]


def show_likelihood(blend, figsize=None, **kwargs):
    """Loss-history plot. Ref: display.py:195-201."""
    import matplotlib.pyplot as plt
    from matplotlib.ticker import MaxNLocator

    fig, ax = plt.subplots(1, 1, figsize=figsize)
    ax.plot(np.asarray(blend.log_likelihood), **kwargs)
    ax.set_xlabel("Iteration")
    ax.xaxis.set_major_locator(MaxNLocator(integer=True))
    ax.set_ylabel("log-Likelihood")
    return fig


def show_observation(observation, norm=None, channel_map=None, sky_coords=None,
                     show_psf=False, add_labels=True, figsize=None):
    """Standardized observation plot. Ref: display.py:204-272."""
    import matplotlib.pyplot as plt

    panels = 1 if show_psf is False else 2
    if figsize is None:
        figsize = (panel_size * panels, panel_size)
    fig, ax = plt.subplots(1, panels, figsize=figsize)
    if not hasattr(ax, "__iter__"):
        ax = (ax,)

    weights = np.asarray(observation.weights)
    mask = np.sum(weights, axis=0) == 0
    if np.all(mask == 0):
        mask = None

    panel = 0
    extent = get_extent(observation.bbox)
    ax[panel].imshow(
        img_to_rgb(observation.data, norm=norm, channel_map=channel_map,
                   mask=mask),
        extent=extent, origin="lower")
    ax[panel].set_title("Observation")

    if add_labels:
        assert sky_coords is not None, "Provide sky_coords for labeled objects"
        for k, center in enumerate(sky_coords):
            if hasattr(observation, "get_pixel"):
                center_ = observation.get_pixel(center)
                color = "w" if observation.C > 1 else "r"
            else:
                center_ = center
                color = "w" if np.asarray(observation.data).shape[0] > 1 \
                    else "r"
            ax[panel].text(*center_[::-1], k, color=color, ha="center",
                           va="center")

    panel += 1
    if show_psf:
        psf_image = np.zeros(np.asarray(observation.data).shape)
        if observation.psf is not None:
            psf_model = np.array(observation.psf.get_model())
            psf_model *= (
                np.asarray(observation.data).mean(axis=0).max()
                / psf_model.mean(axis=0).max()
            )
            shift = tuple(
                psf_image.shape[c] // 2 - psf_model.shape[c] // 2
                for c in range(psf_image.ndim)
            )
            model_box = Box(psf_model.shape) + shift
            model_box.insert_into(psf_image, psf_model)
        ax[panel].imshow(img_to_rgb(psf_image, norm=norm), origin="lower")
        ax[panel].set_title("PSF")

    fig.tight_layout()
    return fig


def show_scene(sources, observation=None, norm=None, channel_map=None,
               show_model=True, show_observed=False, show_rendered=False,
               show_residual=False, add_labels=True, add_boxes=False,
               figsize=None, linear=True):
    """Model/observed/rendered/residual panels. Ref: display.py:275-436."""
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle, Polygon
    import jax.numpy as jnp

    if show_observed or show_rendered or show_residual:
        assert observation is not None, \
            "Provide matched observation to show observed frame"

    panels = sum((show_model, show_observed, show_rendered, show_residual))
    if linear:
        if figsize is None:
            figsize = (panel_size * panels, panel_size)
        fig, ax = plt.subplots(1, panels, figsize=figsize)
    else:
        columns = int(np.ceil(panels / 2))
        if figsize is None:
            figsize = (panel_size * columns, panel_size * 2)
        fig = plt.figure(figsize=figsize)
        ax = [fig.add_subplot(2, columns, n + 1) for n in range(panels)]
    if not hasattr(ax, "__iter__"):
        ax = (ax,)

    mask = None
    if observation is not None:
        mask = np.sum(np.asarray(observation.weights), axis=0) == 0
        if np.all(mask == 0):
            mask = None

    model_frame = sources[0].frame
    model = np.zeros(model_frame.shape)
    for src in sources:
        model = model + np.asarray(src.get_model(frame=model_frame))

    panel = 0
    if show_model:
        extent = get_extent(model_frame.bbox)
        ax[panel].imshow(img_to_rgb(model, norm=norm, channel_map=channel_map),
                         extent=extent, origin="lower")
        ax[panel].set_title("Model")
        panel += 1

    if show_rendered or show_residual:
        model = np.asarray(observation.render(jnp.asarray(model)))
        extent = get_extent(observation.bbox)

    if show_rendered:
        ax[panel].imshow(
            img_to_rgb(model, norm=norm, channel_map=channel_map, mask=mask),
            extent=extent, origin="lower")
        ax[panel].set_title("Model Rendered")
        panel += 1

    if show_observed:
        ax[panel].imshow(
            img_to_rgb(observation.data, norm=norm, channel_map=channel_map,
                       mask=mask),
            extent=extent, origin="lower")
        ax[panel].set_title("Observation")
        panel += 1

    if show_residual:
        residual = np.asarray(observation.data) - model
        norm_ = LinearPercentileNorm(residual)
        ax[panel].imshow(
            img_to_rgb(residual, norm=norm_, channel_map=channel_map,
                       mask=mask),
            extent=extent, origin="lower")
        ax[panel].set_title("Residual")
        panel += 1

    for k, src in enumerate(sources):
        if add_boxes:
            panel = 0
            box_kwargs = {"facecolor": "none", "edgecolor": "w", "lw": 0.5}
            if show_model:
                extent = get_extent(src.bbox)
                rect = Rectangle(
                    (extent[0], extent[2]),
                    extent[1] - extent[0],
                    extent[3] - extent[2],
                    **box_kwargs)
                ax[panel].add_artist(rect)
                panel = 1
            if observation is not None:
                start = src.bbox.start[-2:][::-1]
                stop = src.bbox.stop[-2:][::-1]
                points = (start, (start[0], stop[1]), stop, (stop[0], start[1]))
                coords = [
                    observation.get_pixel(model_frame.get_sky_coord(p))
                    for p in points
                ]
                for panel in range(panel, panels):
                    poly = Polygon(coords, closed=True, **box_kwargs)
                    ax[panel].add_artist(poly)

        if add_labels and hasattr(src, "center") and src.center is not None:
            center = src.center
            panel = 0
            if show_model:
                ax[panel].text(*center[::-1], k, color="w", ha="center",
                               va="center")
                panel = 1
            if observation is not None:
                center_ = observation.get_pixel(
                    model_frame.get_sky_coord(center))
                for panel in range(panel, panels):
                    ax[panel].text(*center_[::-1], k, color="w", ha="center",
                                   va="center")

    fig.tight_layout()
    return fig


def show_sources(sources, observation=None, norm=None, channel_map=None,
                 show_model=True, show_observed=False, show_rendered=False,
                 show_spectrum=True, figsize=None, model_mask=None,
                 add_markers=True, add_boxes=False):
    """Per-source inspection panels. Ref: display.py:439-594."""
    import matplotlib.pyplot as plt
    from matplotlib.patches import Polygon
    import jax.numpy as jnp
    from .models.source import NullSource
    from .models.component import Component

    if show_observed or show_rendered:
        assert observation is not None, \
            "Provide matched observation to show observed frame"

    panels = sum((show_model, show_observed, show_rendered, show_spectrum))
    n_sources = len([s for s in sources if not isinstance(s, NullSource)])
    if figsize is None:
        figsize = (panel_size * panels, panel_size * n_sources)
    fig, ax = plt.subplots(n_sources, panels, figsize=figsize, squeeze=False)

    marker_kwargs = {"mew": 1, "ms": 10}
    box_kwargs = {"facecolor": "none", "edgecolor": "w", "lw": 0.5}

    skipped = 0
    for k, src in enumerate(sources):
        if isinstance(src, NullSource):
            skipped += 1
            continue
        model_frame = src.frame
        center = None
        if hasattr(src, "center") and src.center is not None:
            center = np.array(src.center)[::-1]

        if add_boxes:
            start = src.bbox.start[-2:][::-1]
            stop = src.bbox.stop[-2:][::-1]
            points = (start, (start[0], stop[1]), stop, (stop[0], start[1]))
            box_coords = [
                observation.get_pixel(model_frame.get_sky_coord(p))
                for p in points
            ]

        panel = 0
        model = np.asarray(src.get_model())
        row = k - skipped

        if show_model:
            extent = get_extent(src.bbox)
            ax[row][panel].imshow(
                img_to_rgb(model, norm=norm, channel_map=channel_map,
                           mask=model_mask),
                extent=extent, origin="lower")
            ax[row][panel].set_title(f"Model Source {k}")
            if center is not None and add_markers:
                ax[row][panel].plot(*center, "wx", **marker_kwargs)
            panel += 1

        if show_rendered:
            model_ = np.asarray(src.get_model(frame=model_frame))
            model_ = np.asarray(observation.render(jnp.asarray(model_)))
            extent = get_extent(observation.bbox)
            ax[row][panel].imshow(
                img_to_rgb(model_, norm=norm, channel_map=channel_map),
                extent=extent, origin="lower")
            ax[row][panel].set_title(f"Model Source {k} Rendered")
            if center is not None and add_markers:
                center_ = observation.get_pixel(
                    model_frame.get_sky_coord(center))
                ax[row][panel].plot(*center_, "wx", **marker_kwargs)
            if add_boxes:
                ax[row][panel].add_artist(
                    Polygon(box_coords, closed=True, **box_kwargs))
            panel += 1

        if show_observed:
            extent = get_extent(observation.bbox)
            ax[row][panel].imshow(
                img_to_rgb(observation.data, norm=norm,
                           channel_map=channel_map),
                extent=extent, origin="lower")
            ax[row][panel].set_title("Observation")
            if center is not None and add_markers:
                center_ = observation.get_pixel(
                    model_frame.get_sky_coord(center))
                ax[row][panel].plot(*center_, "wx", **marker_kwargs)
            if add_boxes:
                ax[row][panel].add_artist(
                    Polygon(box_coords, closed=True, **box_kwargs))
            panel += 1

        if show_spectrum:
            if hasattr(src, "__iter__") and len(src.children) and \
                    isinstance(src.children[0], Component):
                spectra = [
                    np.asarray(c.get_model()).sum(axis=(1, 2))
                    for c in src.children
                ]
            else:
                spectra = [model.sum(axis=(1, 2))]
            for spectrum in spectra:
                ax[row][panel].plot(spectrum)
            ax[row][panel].set_xticks(range(len(spectrum)))
            if getattr(src.frame, "channels", None) is not None:
                ax[row][panel].set_xticklabels(src.frame.channels)
            ax[row][panel].set_title("Spectrum")
            ax[row][panel].set_xlabel("Channel")
            ax[row][panel].set_ylabel("Intensity")

    fig.tight_layout()
    return fig
