"""Centered FFT convolution engine.

This is the performance core of the framework: PSF (difference-)kernel
convolutions, PSF matching, and sub-pixel shifts, all expressed as pure
functions over ``jnp`` arrays so they fuse under ``jax.jit`` and lower to XLA
FFT ops on TPU.

Conventions (behavioral reference: scarlet/fft.py:9-167):

* Images are stored with the object centered in the array ("centered" order).
  Before an FFT the image is zero-padded to a fast FFT shape and rolled to
  FFT standard order with ``ifftshift``; after an inverse FFT it is rolled
  back with ``fftshift`` and center-cropped.
* For an odd array placed into an even shape, the center lands on the
  center-*right* pixel (``np.fft.fftshift`` convention): crop start index is
  ``(curr - new + 1) // 2`` and pad left width is ``(new - curr + 1) // 2``.
* FFT shapes are chosen with ``next_fast_len`` over ``shape1 + shape2 +
  padding`` with the reference's even-dimension constraints, so results are
  numerically comparable with the reference implementation.

The hot path (:func:`convolve_fft`) takes a precomputed kernel rFFT — the
moral equivalent of the reference's per-shape FFT memo dict
(scarlet/fft.py:255-273) — as an explicit pytree value, which is the
jit-friendly formulation.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.fft import next_fast_len

__all__ = [
    "centered",
    "zero_pad",
    "fast_zero_pad",
    "good_fft_shape",
    "minimal_even_fft_shape",
    "minimal_same_fft_shape",
    "transform",
    "inverse_transform",
    "Fourier",
    "convolve",
    "convolve_fft",
    "convolve_dft",
    "dft_conv_matrices",
    "match_psf",
    "shift",
    "mk_shifter",
]


def _normalize_axes(ndim, axes):
    if axes is None:
        axes = tuple(range(ndim))
    try:
        iter(axes)
    except TypeError:
        axes = (axes,)
    return tuple(a % ndim for a in axes)


def centered(arr, newshape, axes=None):
    """Center-crop ``arr`` to ``newshape`` (fftshift convention).

    If ``arr`` is odd-sized and ``newshape`` even, the center pixel of the
    result is the center-right pixel of ``arr``.  Ref: scarlet/fft.py:9-36.
    """
    axes = _normalize_axes(arr.ndim, axes)
    if len(newshape) == arr.ndim and len(axes) != arr.ndim:
        newshape = [newshape[a] for a in axes]
    slices = [slice(None)] * arr.ndim
    for a, new in zip(axes, newshape):
        curr = arr.shape[a]
        if new > curr:
            raise ValueError(
                f"arr must be larger than newshape, got {arr.shape} -> {newshape}"
            )
        start = (curr - new + 1) // 2
        slices[a] = slice(start, start + new)
    return arr[tuple(slices)]


def fast_zero_pad(arr, pad_width):
    """Zero-pad with explicit per-axis (before, after) widths."""
    return jnp.pad(arr, pad_width)


def zero_pad(arr, newshape, axes=None):
    """Zero-pad ``arr`` to ``newshape`` (inverse of :func:`centered`).

    Left pad is ``(new - curr + 1) // 2``.  Ref: scarlet/fft.py:82-113.
    """
    axes = _normalize_axes(arr.ndim, axes)
    if len(newshape) == arr.ndim and len(axes) != arr.ndim:
        newshape = [newshape[a] for a in axes]
    pad_width = [(0, 0)] * arr.ndim
    for a, new in zip(axes, newshape):
        ds = new - arr.shape[a]
        left = (ds + 1) // 2
        pad_width[a] = (left, ds - left)
    return jnp.pad(arr, pad_width)


def good_fft_shape(im_or_shape1, im_or_shape2, padding=3, axes=None, use_max=False):
    """Fast FFT shape for convolving two images along ``axes``.

    Mirrors the reference's choice — ``next_fast_len(s1 + s2 + padding)``
    with an even last dimension and an even second-to-last dimension when
    image 2's is even — so kernel/pixel-center conventions agree.
    Ref: scarlet/fft.py:116-167.
    """
    shape1 = np.asarray(getattr(im_or_shape1, "shape", im_or_shape1))
    shape2 = np.asarray(getattr(im_or_shape2, "shape", im_or_shape2))
    if len(shape1) != len(shape2):
        raise ValueError(
            f"img1 and img2 must have the same ndim, got {len(shape1)}, {len(shape2)}"
        )
    if axes is None:
        if use_max:
            shape = np.max([shape1, shape2], axis=0)
        else:
            shape = shape1 + shape2
    else:
        try:
            iter(axes)
        except TypeError:
            axes = [axes]
        shape = np.zeros(len(axes), dtype=int)
        for n, ax in enumerate(axes):
            if use_max:
                shape[n] = max(shape1[ax], shape2[ax])
            else:
                shape[n] = shape1[ax] + shape2[ax]

    shape = shape + padding
    shape = [next_fast_len(int(s)) for s in shape]
    # Even-dimension constraints for cross-implementation comparability.
    while shape[-1] % 2 != 0:
        shape[-1] = next_fast_len(shape[-1] + 1)
    if shape2[-2] % 2 == 0:
        while shape[-2] % 2 != 0:
            shape[-2] = next_fast_len(shape[-2] + 1)
    return tuple(int(s) for s in shape)


def good_fft_shape_even(im_or_shape1, im_or_shape2, padding=3, axes=None,
                        use_max=False):
    """Like :func:`good_fft_shape` but with every transformed dimension
    even — the TPU backend's FFT requires even sizes, and even/even padding
    keeps the fftshift center conventions exact."""
    shape = list(good_fft_shape(im_or_shape1, im_or_shape2, padding=padding,
                                axes=axes, use_max=use_max))
    for i in range(len(shape)):
        while shape[i] % 2 != 0:
            shape[i] = next_fast_len(shape[i] + 1)
    return tuple(shape)


def _next_even_5smooth(n):
    """Smallest even {2,3,5}-smooth integer >= n."""
    m = n + (n % 2)
    while True:
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 2


def minimal_even_fft_shape(im_or_shape1, im_or_shape2, axes=(-2, -1)):
    """Smallest exact FFT shape for the linear convolution of two images:
    per transformed axis, the smallest even {2,3,5}-smooth size
    >= s1 + s2 - 1.

    Linear convolution is exact for any FFT size >= s1 + s2 - 1, so the
    reference's extra padding (fft.py:116-167) buys nothing; and on TPU the
    radix-5 sizes this admits are measurably faster than the larger
    {2,3}-smooth ones (e.g. (100, 90) beats (108, 96) by ~40%).  Used by
    the hot convolution paths; parity-sensitive host code keeps
    :func:`good_fft_shape_even`.
    """
    shape1 = np.asarray(getattr(im_or_shape1, "shape", im_or_shape1))
    shape2 = np.asarray(getattr(im_or_shape2, "shape", im_or_shape2))
    return tuple(
        _next_even_5smooth(int(shape1[ax] + shape2[ax] - 1)) for ax in axes)


def minimal_same_fft_shape(im_or_shape1, im_or_shape2, axes=(-2, -1)):
    """Smallest even {2,3,5}-smooth FFT shape whose CENTER-CROPPED
    ('same'-size) circular convolution equals the full linear convolution.

    The full linear convolution needs ``s1 + s2 - 1`` points, but the hot
    path only keeps the centered ``s1`` crop — circular wrap-around is
    confined to the discarded margin whenever ``M >= s1 + (s2 - 1) // 2``
    (odd kernel axes; bit-verified across parities in tests/test_fft.py).
    For the engine's (100, 90) HSC case this is (80, 72): ~1.6x less FFT
    work per convolution, exactly.  Even kernel axes keep the full exact
    size (their pixel-center convention shifts with the FFT parity).
    """
    shape1 = np.asarray(getattr(im_or_shape1, "shape", im_or_shape1))
    shape2 = np.asarray(getattr(im_or_shape2, "shape", im_or_shape2))
    out = []
    for ax in axes:
        s1, s2 = int(shape1[ax]), int(shape2[ax])
        if s2 % 2 == 1:
            m = max(s1 + (s2 - 1) // 2, s2)
        else:
            m = s1 + s2 - 1
        out.append(_next_even_5smooth(m))
    return tuple(out)


def transform(image, fft_shape, axes=(-2, -1)):
    """rFFT of a centered image: pad -> ifftshift -> rfftn.

    Ref: scarlet/fft.py:255-273.
    """
    axes = _normalize_axes(image.ndim, axes)
    if len(fft_shape) != len(axes):
        raise ValueError(f"fft_shape {fft_shape} and axes {axes} mismatch")
    padded = zero_pad(image, fft_shape, axes)
    return jnp.fft.rfftn(jnp.fft.ifftshift(padded, axes), axes=axes)


def inverse_transform(kimage, fft_shape, real_shape, axes=(-2, -1)):
    """Inverse of :func:`transform`: irfftn -> fftshift -> center-crop to
    ``real_shape``.  Ref: scarlet/fft.py:200-243.
    """
    ndim = kimage.ndim
    axes = _normalize_axes(ndim, axes)
    image = jnp.fft.irfftn(kimage, fft_shape, axes=axes)
    image = jnp.fft.fftshift(image, axes)
    if len(real_shape) == ndim:
        crop = [real_shape[a] for a in axes]
    else:
        crop = list(real_shape)
    return centered(image, crop, axes)


class Fourier:
    """A real-space image together with memoized rFFTs per (shape, axes).

    Host-side convenience mirroring the reference API (scarlet/fft.py:170-313);
    inside jit use :func:`transform`/:func:`convolve_fft` with explicit
    precomputed kernel FFTs instead.
    """

    def __init__(self, image, image_fft=None):
        self._image = jnp.asarray(image)
        self._fft = {} if image_fft is None else dict(image_fft)

    @staticmethod
    def from_fft(image_fft, fft_shape, image_shape, axes=None):
        if axes is None:
            axes = tuple(range(image_fft.ndim))
        axes = _normalize_axes(len(image_shape), axes)
        image = inverse_transform(image_fft, fft_shape, image_shape, axes)
        key = (tuple(fft_shape), tuple(axes))
        return Fourier(image, {key: image_fft})

    @property
    def image(self):
        return self._image

    @property
    def shape(self):
        return self._image.shape

    def fft(self, fft_shape, axes):
        axes = _normalize_axes(self._image.ndim, axes)
        key = (tuple(fft_shape), tuple(axes))
        if key not in self._fft:
            self._fft[key] = transform(self._image, fft_shape, axes)
        return self._fft[key]

    def __len__(self):
        return len(self._image)

    def __getitem__(self, index):
        # Slicing along leading (non-transformed) axes keeps cached FFTs
        # usable only when the sliced axes were not transformed; for
        # simplicity we only propagate the real image and re-FFT on demand.
        return Fourier(self._image[index])

    def __array__(self, dtype=None, copy=None):
        # without this, np.asarray falls back to the sequence protocol via
        # __len__/__getitem__ and recurses into per-row Fourier objects
        import numpy as _np

        arr = _np.asarray(self._image)
        return arr.astype(dtype) if dtype is not None else arr


def _as_fourier(x):
    return x if isinstance(x, Fourier) else Fourier(x)


def convolve_fft(image, kernel_rfft, fft_shape, axes=(-2, -1), real_shape=None):
    """Hot-path convolution with a precomputed kernel rFFT.

    ``image`` is a centered real image; ``kernel_rfft`` its matching kernel
    transform at ``fft_shape``.  Pure and jit-friendly.
    """
    if real_shape is None:
        real_shape = image.shape
    kimage = transform(image, fft_shape, axes)
    return inverse_transform(kimage * kernel_rfft, fft_shape, real_shape, axes)


def dft_conv_matrices(in_shape, fft_shape, dtype=np.float32):
    """Folded matmul-DFT operators for :func:`convolve_dft`.

    Four matrices (split re/im stacks) that implement
    ``transform``/``inverse_transform`` (zero_pad + ifftshift + rfft2, and
    irfft2 + fftshift + center-crop back to ``in_shape``) as matrix
    products: ``Y = A @ X @ B`` and ``out = Re(iA @ (Y*K) @ iB)``.  The
    pad/shift/crop index maps are folded into the matrices, so the matmuls
    touch only the ``in_shape`` pixels.

    On TPU the small centered transforms of the fit loop run ~1.5x faster
    through the MXU this way than through the XLA FFT (exact to f32
    roundoff; see BASELINE.md).  Host-cached per (shape, dtype).
    """
    from ..cache import Cache

    Hs, Ws = int(in_shape[0]), int(in_shape[1])
    Hf, Wf = int(fft_shape[0]), int(fft_shape[1])
    key = (Hs, Ws, Hf, Wf, str(np.dtype(dtype)))
    try:
        return Cache.check("dft_conv_matrices", key)
    except KeyError:
        pass
    cdtype = np.complex128 if np.dtype(dtype) == np.float64 else np.complex64
    Wh = Wf // 2 + 1
    f_y = np.arange(Hf)
    f_x = np.arange(Wh)

    # forward: input row r sits at padded index r + left, then ifftshift
    # rolls by -(Hf//2)
    left_y = (Hf - Hs + 1) // 2
    col_y = (np.arange(Hs) + left_y - Hf // 2) % Hf
    A = np.exp(-2j * np.pi * np.outer(f_y, col_y) / Hf)          # (Hf, Hs)
    left_x = (Wf - Ws + 1) // 2
    col_x = (np.arange(Ws) + left_x - Wf // 2) % Wf
    B = np.exp(-2j * np.pi * np.outer(col_x, f_x) / Wf)          # (Ws, Wh)

    # inverse: output pixel i reads shifted index start + i, i.e. raw
    # index (start + i - n//2) % n; hermitian weights double the
    # non-endpoint rfft bins
    start_y = (Hf - Hs + 1) // 2
    row_y = (np.arange(Hs) + start_y - Hf // 2) % Hf
    iA = np.exp(2j * np.pi * np.outer(row_y, f_y) / Hf) / Hf     # (Hs, Hf)
    start_x = (Wf - Ws + 1) // 2
    row_x = (np.arange(Ws) + start_x - Wf // 2) % Wf
    wgt = np.full(Wh, 2.0)
    wgt[0] = 1.0
    if Wf % 2 == 0:
        wgt[-1] = 1.0
    iB = (np.exp(2j * np.pi * np.outer(f_x, row_x) / Wf)
          * wgt[:, None]) / Wf                                   # (Wh, Ws)

    def split(m):
        return np.stack([m.real, m.imag]).astype(dtype)

    out = tuple(split(m.astype(cdtype)) for m in (A, B, iA, iB))
    Cache.set("dft_conv_matrices", key, out)
    return out


def convolve_dft(image, kernel_rfft, matrices, precision="float32"):
    """Centered convolution via folded matmul-DFT (see
    :func:`dft_conv_matrices`).  Semantically identical to
    :func:`convolve_fft` with ``real_shape == image.shape``; leading batch
    axes broadcast.  Runs the spectral contractions on the MXU at
    ``precision="float32"`` (XLA HIGHEST — f32-equivalent, the tier the
    on-chip bitwise logL parity rests on) by default.  Measured tiers on
    the v5e steady fit (BASELINE r5 conv-precision A/B):
    ``"high"`` (3-pass bf16) +1.9% throughput at max per-blend |logL|
    drift 0.20 (~2e-5 relative); ``"default"`` (1-pass bf16) +4.2% but a
    genuinely degraded solution (drift 238; logL -8857 vs -8619 in the
    r3 capture).  Both are opt-in via ``LiteFitConfig.conv_precision``
    and never the default."""
    import jax

    A, B, iA, iB = (jax.lax.complex(jnp.asarray(m[0]), jnp.asarray(m[1]))
                    for m in matrices)
    ein = lambda s, *ops: jnp.einsum(s, *ops, precision=precision)  # noqa
    y = ein("ij,...jk,kl->...il", A, image.astype(A.dtype), B)
    out = ein("ij,...jk,kl->...il", iA, y * kernel_rfft, iB)
    return jnp.real(out)


def convolve(image, kernel, padding=3, axes=(-2, -1), return_fourier=True):
    """Convolve ``image`` with a centered ``kernel``. Ref: scarlet/fft.py:368-396."""
    image = _as_fourier(image)
    kernel = _as_fourier(kernel)
    fft_shape = good_fft_shape(image.image, kernel.image, padding, axes)
    axes_n = _normalize_axes(image.image.ndim, axes)
    kimage = image.fft(fft_shape, axes_n) * kernel.fft(fft_shape, axes_n)
    result = Fourier.from_fft(kimage, fft_shape, image.shape, axes_n)
    if return_fourier:
        return result
    return jnp.real(result.image)


def match_psf(psf1, psf2, padding=3, axes=(-2, -1), return_fourier=True):
    """Difference kernel ``k`` with ``psf2 * k = psf1`` (k-space ratio).

    Ref: scarlet/fft.py:334-365.
    """
    psf1 = _as_fourier(psf1)
    psf2 = _as_fourier(psf2)
    shape = psf2.shape if psf1.shape[0] < psf2.shape[0] else psf1.shape
    fft_shape = good_fft_shape(psf1.image, psf2.image, padding, axes)
    axes_n = _normalize_axes(psf1.image.ndim, axes)
    kimage = psf1.fft(fft_shape, axes_n) / psf2.fft(fft_shape, axes_n)
    result = Fourier.from_fft(kimage, fft_shape, shape, axes_n)
    if return_fourier:
        return result
    return jnp.real(result.image)


def mk_shifter(shape, real=False):
    """Fourier-domain shift phase gradients ``(-2*pi*i*freq_y, -2*pi*i*freq_x)``.

    Ref: scarlet/interpolation.py:341-375.
    """
    freq_x = np.fft.rfftfreq(shape[-1])
    freq_y = np.fft.rfftfreq(shape[-2]) if real else np.fft.fftfreq(shape[-2])
    shift_y = jnp.asarray(-1j * 2 * np.pi * freq_y)
    shift_x = jnp.asarray(-1j * 2 * np.pi * freq_x)
    return shift_y, shift_x


def shift(image, shift_yx, fft_shape=None, axes=(-2, -1), return_fourier=True):
    """Sub-pixel shift of ``image`` by ``(dy, dx)`` via Fourier phasors.

    Ref: scarlet/fft.py:399-428.
    """
    image = _as_fourier(image)
    if fft_shape is None:
        fft_shape = good_fft_shape(image.image, image.image, padding=10, axes=axes)
    axes_n = _normalize_axes(image.image.ndim, axes)
    shifter_y, shifter_x = mk_shifter(fft_shape)
    image_fft = image.fft(fft_shape, axes_n)
    shifter = jnp.exp(shifter_y[:, None] * shift_yx[0]) * jnp.exp(
        shifter_x[None, :] * shift_yx[1]
    )
    ndim = image.image.ndim
    if ndim > 2:
        expand = tuple(d for d in range(ndim) if d not in axes_n)
        shifter = jnp.expand_dims(shifter, axis=expand)
    result_fft = image_fft * shifter
    result = Fourier.from_fft(result_fft, fft_shape, image.shape, axes_n)
    if return_fourier:
        return result
    return jnp.real(result.image)
