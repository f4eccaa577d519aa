"""Renderers: parameterized transformations from the model frame into an
observation's frame.

Behavioral reference: scarlet/renderer.py.  All transforms are pure ``jnp``
functions of the model (and optional renderer parameters like ``psf_shift``),
so ``jax.grad`` flows through rendering; the difference-kernel FFT is
precomputed once per (model shape, kernel) pair, the jit-friendly analog of
the reference's memoized ``Fourier`` objects.

``ResolutionRenderer`` (multi-resolution sinc resampling) lives in
:mod:`scarlet_tpu.models.resolution`.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bbox import Box, overlapped_slices
from ..ops import fft as fft_ops
from ..ops import interpolation
from .model import Model
from .parameter import Parameter

__all__ = ["Renderer", "NullRenderer", "ConvolutionRenderer", "convolve",
           "match_shape"]


def convolve(image, kernel, bounds=None):
    """Real-space per-channel convolution (XLA depthwise conv).

    Drop-in for the reference's C++ ``apply_filter`` path
    (renderer.py:97-127); ``bounds`` is accepted for API parity but unused —
    XLA fuses the shifted-block adds itself.
    """
    image = jnp.asarray(image)
    kernel = jnp.asarray(kernel)
    C = image.shape[0]
    kh, kw = kernel.shape[-2:]
    assert kh % 2 == 1 and kw % 2 == 1, "kernel must be odd-sized"
    k = jnp.flip(kernel, axis=(-2, -1))
    return jax.lax.conv_general_dilated(
        image[None].astype(k.dtype),
        k[:, None],
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]


def match_shape(model, data_frame, slices):
    """Slice/zero-pad a rendered model to the data frame's spatial shape.

    Ref: scarlet/renderer.py:130-161; jnp-native (autodiff slices/pads
    natively, no custom vjp needed).
    """
    data_slices, model_slices = slices
    data_shape = data_frame.shape
    if any(
        data_slices[d].stop - data_slices[d].start != data_shape[d]
        for d in range(-2, 0)
    ):
        matched = jnp.zeros(data_frame.shape, dtype=model.dtype)
        return matched.at[data_slices].set(model[model_slices])
    return model[model_slices]


class Renderer(Model):
    """Base renderer: channel mapping + a parameterized transform.

    Ref: scarlet/renderer.py:12-83.
    """

    def __init__(self, data_frame, model_frame, *parameters):
        self.data_frame = data_frame
        self.model_frame = model_frame
        self.channel_map = self.get_channel_map(data_frame, model_frame)
        super().__init__(*parameters)

    def __call__(self, model, *parameters):
        self.transform = self.get_model(*parameters)
        return self.transform(model)

    def get_channel_map(self, data_frame, model_frame):
        """None (identical), slice (contiguous subset), or index list.

        Ref: renderer.py:26-64.
        """
        if list(data_frame.channels) == list(model_frame.channels):
            return None
        channel_map = [
            list(model_frame.channels).index(c)
            for c in list(data_frame.channels)
        ]
        min_channel = min(channel_map)
        max_channel = max(channel_map)
        if max_channel + 1 - min_channel == len(channel_map):
            channel_map = slice(min_channel, max_channel + 1)
        return channel_map

    def map_channels(self, model):
        """Restrict/mix model channels onto observation channels.

        Ref: renderer.py:66-83.
        """
        if self.channel_map is None:
            return model
        if isinstance(self.channel_map, slice):
            return model[self.channel_map]
        if isinstance(self.channel_map, list):
            return model[jnp.asarray(self.channel_map)]
        return jnp.dot(jnp.asarray(self.channel_map), model,
                       precision="float32")


class NullRenderer(Renderer):
    """Identity transform (observation in the model frame already).

    Ref: renderer.py:86-94.
    """

    def __init__(self, data_frame, model_frame):
        super().__init__(data_frame, model_frame)

    def get_model(self, *parameters):
        def nothing(model):
            return model
        return nothing


class ConvolutionRenderer(Renderer):
    """Same-grid rendering: channel map -> difference-kernel convolution ->
    spatial shape matching.  Ref: scarlet/renderer.py:164-259.
    """

    def __init__(self, data_frame, model_frame, *parameters,
                 convolution_type="fft", padding=10, psf_shift=None):
        if psf_shift is not None:
            psf_shift = Parameter(psf_shift, name="psf_shift", step=1.0e-2)
            parameters = (*parameters, psf_shift)

        super().__init__(data_frame, model_frame, *parameters)

        assert convolution_type in ("real", "fft"), \
            "`convolution` must be either 'real' or 'fft'"
        self._convolution_type = convolution_type

        # 2D region covered by data inside the model frame (translation only,
        # ref renderer.py:187-192).  The box extent is exactly the data
        # frame's spatial shape — deriving it from round(max)+1 (as the
        # reference does) is fragile under the ~1e-13 noise of the WCS
        # round-trip when grids sit at half-pixel offsets.
        pixel_in_model_frame = data_frame.convert_pixel_to(model_frame)
        mins = pixel_in_model_frame.min(axis=0)
        ll = np.round(mins).astype(int)
        ur = ll + np.asarray(data_frame.shape[-2:], int)
        bounds = (ll[0], ur[0]), (ll[1], ur[1])
        data_box = model_frame.bbox[0] @ Box.from_bounds(*bounds)
        self.slices = overlapped_slices(data_box, model_frame.bbox)

        psf = jnp.asarray(data_frame.psf.get_model()).astype(model_frame.dtype)
        model_psf = jnp.asarray(model_frame.psf.get_model()).astype(
            model_frame.dtype)
        self.diff_kernel = fft_ops.match_psf(
            fft_ops.Fourier(psf), fft_ops.Fourier(model_psf), padding=padding)

        # Same-scale grids can still sit at a fractional pixel offset (e.g.
        # concentric even- and odd-sized frames are exactly half a pixel
        # apart). Fold the subpixel residual into the difference kernel as a
        # one-time Fourier shift so the sliced render lands on the data grid
        # (the reference's integer-only slicing loses this, renderer.py:190).
        frac = mins - ll
        if np.any(np.abs(frac) > 1e-6):
            shifted = fft_ops.shift(self.diff_kernel.image,
                                    jnp.asarray(-frac, model_frame.dtype),
                                    axes=(-2, -1), return_fourier=False)
            self.diff_kernel = fft_ops.Fourier(shifted)

        # precompute kernel rFFT for the model-shaped hot path (smallest
        # exact even 5-smooth shape: fastest on the TPU FFT)
        self._model_shape = tuple(model_frame.shape)
        self._fft_shape = fft_ops.minimal_even_fft_shape(
            np.zeros(self._model_shape), np.asarray(self.diff_kernel.image),
            axes=(-2, -1))
        self._kernel_rfft = fft_ops.transform(
            self.diff_kernel.image, self._fft_shape, (-2, -1))

    @property
    def convolution_bounds(self):
        """Filter clip bounds (API parity; unused by the XLA conv path)."""
        if not hasattr(self, "_convolution_bounds"):
            coords = interpolation.get_filter_coords(
                np.asarray(self.diff_kernel.image)[0])
            self._convolution_bounds = interpolation.get_filter_bounds(
                coords.reshape(-1, 2))
        return self._convolution_bounds

    def convolve(self, model, convolution_type=None, psf_shift=None):
        """Convolve the (channel-mapped) model with the difference kernel.

        Ref: renderer.py:215-241.
        """
        if convolution_type is None:
            convolution_type = self._convolution_type

        if psf_shift is not None:
            kernel = fft_ops.shift(
                self.diff_kernel.image, psf_shift, fft_shape=None,
                axes=(-2, -1), return_fourier=False)
        else:
            kernel = None  # use precomputed rFFT

        if convolution_type == "real":
            k = kernel if kernel is not None else self.diff_kernel.image
            return convolve(model, k)
        if convolution_type == "fft":
            # the difference kernel lives in observation channel space, so it
            # applies directly to the channel-mapped model
            if kernel is None and model.shape[-2:] == self._model_shape[-2:]:
                return fft_ops.convolve_fft(
                    model, self._kernel_rfft, self._fft_shape, (-2, -1))
            k = kernel if kernel is not None else self.diff_kernel.image
            return fft_ops.convolve(
                fft_ops.Fourier(model), fft_ops.Fourier(k), axes=(1, 2),
                return_fourier=False)
        raise ValueError(
            f"`convolution` must be 'real' or 'fft', got {convolution_type}")

    def __call__(self, model, *parameters):
        self.transform = self.get_model(*parameters)
        return self.transform(model, *parameters)

    def get_model(self, *parameters):
        def transform(model, *parameters):
            model_ = self.map_channels(model)
            shift = self.get_parameter("psf_shift", *parameters)
            model_ = self.convolve(model_, psf_shift=shift)
            model_ = match_shape(model_, self.data_frame, self.slices)
            return model_
        return transform
