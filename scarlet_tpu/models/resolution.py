"""Multi-resolution rendering: map the model frame onto an observation with
a different pixel scale and/or rotation by band-limited (sinc) resampling.

Behavioral reference: scarlet/renderer.py:262-547 (ResolutionRenderer).
The math is identical — the low-resolution image is the PSF-difference-
convolved model evaluated at the LR pixel positions by sinc interpolation,
scaled by the pixel-area ratio h^2 — but the TPU formulation is different:

* aligned (unrotated) grids: one FFT convolution of the model with the
  difference kernel followed by two dense sinc-sampling matrix products
  ``LR = h^2 * P_y (model (*) K) P_x^T`` — two MXU matmuls per channel
  (the reference's `_resconv_op` einsums, renderer.py:352-363, rearranged).
* rotated grids: the LR position of pixel (i, j) decomposes affinely as
  ``p_ij = s_i + o_j + t``; we precompute a stack of kernel images
  Fourier-shifted to ``s_i + t`` and shift the model by ``-o_j`` at render
  time, so ``LR[c,i,j] = h^2 <A_i, B_j>`` — per-channel matmuls over the
  padded grid (same per-row/column shift decomposition as the reference's
  `sinc_shift`, renderer.py:414-476).

Both paths are pure jnp and differentiable through the model.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import fft as fft_ops
from ..ops import interpolation
from .renderer import Renderer

__all__ = ["ResolutionRenderer"]


class ResolutionRenderer(Renderer):
    """Render a model frame into an observation at different resolution
    and/or orientation.  Ref: scarlet/renderer.py:262-547.
    """

    def __init__(self, data_frame, model_frame, padding=10):
        super().__init__(data_frame, model_frame)

        self.angle, self.h = interpolation.get_angles(data_frame.wcs,
                                                      model_frame.wcs)
        self.isrot = (np.abs(self.angle[1]) ** 2) > np.finfo(float).eps

        # ---- difference kernel at model resolution (ref: 365-412) ----
        diff_kernel = self._build_diffkernel(data_frame, model_frame)
        self._diff_kernel = jnp.asarray(diff_kernel, model_frame.dtype)

        # ---- LR pixel positions in the model frame, affine decomposition --
        C_obs = data_frame.C
        Ny_lr, Nx_lr = data_frame.shape[-2:]
        H, W = model_frame.shape[-2:]

        rows = np.stack([np.arange(Ny_lr), np.zeros(Ny_lr)], axis=1)
        cols = np.stack([np.zeros(Nx_lr), np.arange(Nx_lr)], axis=1)
        origin = np.atleast_2d(
            data_frame.convert_pixel_to(model_frame, pixel=np.array([[0., 0.]]))
        )[0]
        pos_rows = np.atleast_2d(
            data_frame.convert_pixel_to(model_frame, pixel=rows))
        pos_cols = np.atleast_2d(
            data_frame.convert_pixel_to(model_frame, pixel=cols))
        s = pos_rows - origin[None, :]     # (Ny_lr, 2): row direction steps
        o = pos_cols - origin[None, :]     # (Nx_lr, 2): column direction steps

        self._model_shape = tuple(model_frame.shape)
        dtype = model_frame.dtype

        if not self.isrot:
            # aligned: rows move only in y, columns only in x
            Y = s[:, 0] + origin[0]        # (Ny_lr,) y positions
            X = o[:, 1] + origin[1]        # (Nx_lr,) x positions
            yy = np.arange(H)
            xx = np.arange(W)
            # plain sinc sampling (the Fourier-phase-shift convention of the
            # reference, renderer.py:441-447): anti-aliasing comes from the
            # difference kernel, which contains the wide LR PSF
            self._P_y = jnp.asarray(
                np.sinc(Y[:, None] - yy[None, :]), dtype)
            self._P_x = jnp.asarray(
                np.sinc(X[:, None] - xx[None, :]), dtype)
            # kernel rFFT for the model-shape convolution
            self._fft_shape = fft_ops.good_fft_shape_even(
                np.zeros(self._model_shape), diff_kernel, padding=3,
                axes=(-2, -1))
            self._kernel_rfft = fft_ops.transform(
                self._diff_kernel, self._fft_shape, (-2, -1))
        else:
            # rotated: precompute kernel images shifted to s_i + origin on a
            # grid padded to avoid circular wrap of the model shifts
            self._fft_shape = fft_ops.good_fft_shape_even(
                np.zeros(self._model_shape), np.zeros(self._model_shape),
                padding=padding, axes=(-2, -1))
            fh, fw = self._fft_shape
            c0 = (fh // 2, fw // 2)

            # pad the flipped kernel into the fft grid (flip: we evaluate
            # K(p - u) = K_flip(u - p))
            k_flip = self._diff_kernel[..., ::-1, ::-1]
            shifter_y, shifter_x = fft_ops.mk_shifter(self._fft_shape)
            k_fft = fft_ops.transform(k_flip, self._fft_shape, (-2, -1))

            # Delta: where model pixel (0, 0) lands in the zero-padded fft
            # grid (zero_pad's left pad), so kernel positions line up with
            # the shifted model embedding
            delta = np.array([(fh - H + 1) // 2, (fw - W + 1) // 2])
            shifts_i = s + origin[None, :] - np.array(c0)[None, :] \
                + delta[None, :]
            phase_i = (
                jnp.exp(shifter_y[None, :, None]
                        * jnp.asarray(shifts_i[:, 0])[:, None, None])
                * jnp.exp(shifter_x[None, None, :]
                          * jnp.asarray(shifts_i[:, 1])[:, None, None])
            )  # (Ny_lr, fh, fw//2+1)
            A_fft = k_fft[None] * phase_i[:, None]   # (Ny_lr, C, fh, fw/2+1)
            A = jnp.fft.irfftn(A_fft, self._fft_shape, axes=(-2, -1))
            A = jnp.fft.fftshift(A, (-2, -1))
            self._A = A.reshape(Ny_lr, C_obs, -1).astype(dtype)

            self._o_shifts = jnp.asarray(o, dtype)   # (Nx_lr, 2)
            self._c0 = c0

        self._Ny_lr, self._Nx_lr = Ny_lr, Nx_lr

    def _build_diffkernel(self, data_frame, model_frame):
        """Difference kernel: sinc-upsampled observation PSF deconvolved by
        the model PSF, at model resolution.  Ref: renderer.py:365-412.
        """
        psf_hr = np.asarray(model_frame.psf.get_model())
        psf_lr = np.asarray(data_frame.psf.get_model()).astype(
            model_frame.dtype)

        pad_shape = (
            np.array(
                (np.array(data_frame.shape[-2:])
                 + np.array(psf_lr.shape[-2:])) / 2
            ).astype(int) * 2 + 1
        )
        h_lr = interpolation.get_pixel_size(
            interpolation.get_affine(data_frame.wcs))
        h_hr = interpolation.get_pixel_size(
            interpolation.get_affine(model_frame.wcs))
        angle, _ = interpolation.get_angles(model_frame.wcs, data_frame.wcs)
        psf_lr_hr = np.asarray(interpolation.sinc_interp_inplace(
            psf_lr, h_lr, h_hr, angle, pad_shape=tuple(pad_shape)))

        psf_hr = psf_hr / np.sum(psf_hr)
        psf_lr_hr = psf_lr_hr / np.sum(psf_lr_hr, axis=(-2, -1),
                                       keepdims=True)

        diff = fft_ops.match_psf(
            fft_ops.Fourier(jnp.asarray(psf_lr_hr)),
            fft_ops.Fourier(jnp.asarray(psf_hr)),
            return_fourier=False,
        )
        return np.asarray(diff)

    def get_model(self, *parameters):
        def transform(model):
            model_ = self.map_channels(model)
            dtype = model_.dtype

            if not self.isrot:
                conv = fft_ops.convolve_fft(
                    model_, self._kernel_rfft, self._fft_shape, (-2, -1))
                # precision pinned: on TPU the DEFAULT tier is 1-pass
                # bf16, a measured quality negative on the engine's conv
                # matmuls (BASELINE r3) — and the CPU suite (exact f32)
                # cannot catch on-chip drift in these sinc resamplings
                out = jnp.einsum(
                    "iy,cyx,jx->cij", self._P_y, conv, self._P_x,
                    preferred_element_type=dtype, precision="float32")
                return (out * self.h ** 2).astype(dtype)

            # rotated: shift the model by -o_j, contract with kernel stack
            fh, fw = self._fft_shape
            shifter_y, shifter_x = fft_ops.mk_shifter(self._fft_shape)
            m_fft = fft_ops.transform(model_, self._fft_shape, (-2, -1))
            phase_j = (
                jnp.exp(shifter_y[None, :, None]
                        * (-self._o_shifts[:, 0])[:, None, None])
                * jnp.exp(shifter_x[None, None, :]
                          * (-self._o_shifts[:, 1])[:, None, None])
            )  # (Nx_lr, fh, fw//2+1)
            B_fft = m_fft[None] * phase_j[:, None]   # (Nx_lr, C, fh, fw/2+1)
            B = jnp.fft.irfftn(B_fft, self._fft_shape, axes=(-2, -1))
            B = jnp.fft.fftshift(B, (-2, -1))
            # model is embedded centered in the fft grid; kernel stack A was
            # built against the same grid with matching center c0
            B = B.reshape(self._Nx_lr, model_.shape[0], -1)
            out = jnp.einsum("icv,jcv->cij", self._A, B,
                             preferred_element_type=dtype,
                             precision="float32")
            return (out * self.h ** 2).astype(dtype)

        return transform
