"""Starlet (isotropic undecimated) wavelet transforms.

The a-trous B3-spline convolution is expressed as five zero-boundary
shift-adds per axis (a linear op XLA fuses into a handful of pads/adds), so
both the transform and its transpose (used by ``jax.grad`` through
``StarletMorphology``) lower cleanly to TPU.

Behavioral reference: scarlet/wavelet.py (file:line cited per function).
Boundary convention: shifted taps that fall off the edge are dropped
(zero boundary), matching wavelet.py:174-191.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .arrays import shift_axis as _shift0

__all__ = [
    "Starlet",
    "bspline_convolve",
    "get_scales",
    "starlet_transform",
    "multiband_starlet_transform",
    "starlet_reconstruction",
    "multiband_starlet_reconstruction",
    "get_multiresolution_support",
    "multiresolution_support_jax",
    "apply_wavelet_denoising",
]

# B3 spline filter from Starck et al. 2011 (ref: wavelet.py:171).
_H1D = (1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16)


def bspline_convolve(image, scale):
    """Separable a-trous B3-spline convolution at ``scale`` (tap spacing
    ``2**scale``), zero boundary.  Ref: wavelet.py:153-191.
    """
    j = int(scale)
    s1, s2 = 2 ** j, 2 ** (j + 1)
    h0, h1, h2, h3, h4 = _H1D

    col = image * h2
    col = col + _shift0(image, s2, -2) * h0
    col = col + _shift0(image, s1, -2) * h1
    col = col + _shift0(image, -s1, -2) * h3
    col = col + _shift0(image, -s2, -2) * h4

    result = col * h2
    result = result + _shift0(col, s2, -1) * h0
    result = result + _shift0(col, s1, -1) * h1
    result = result + _shift0(col, -s1, -1) * h3
    result = result + _shift0(col, -s2, -1) * h4
    return result


def get_scales(image_shape, scales=None):
    """Default/maximum number of starlet scales. Ref: wavelet.py:200-217."""
    max_scale = int(np.log2(np.min(image_shape[-2:]))) - 1
    if scales is None or scales > max_scale:
        scales = max_scale
    return int(scales)


def starlet_transform(image, scales=None, generation=2, convolve2D=None):
    """(scales+1, Ny, Nx) starlet dictionary of a 2D image.

    Ref: wavelet.py:220-266.
    """
    assert image.ndim == 2, f"Image should be 2D, got {image.ndim}D"
    assert generation in (1, 2), f"generation should be 1 or 2, got {generation}"
    scales = get_scales(image.shape, scales)
    if convolve2D is None:
        convolve2D = bspline_convolve

    c = image
    coeffs = []
    for j in range(scales):
        gen1 = convolve2D(c, j)
        if generation == 2:
            gen2 = convolve2D(gen1, j)
            coeffs.append(c - gen2)
        else:
            coeffs.append(c - gen1)
        c = gen1
    coeffs.append(c)
    return jnp.stack(coeffs)


def multiband_starlet_transform(image, scales=None, generation=2, convolve2D=None):
    """(scales+1, B, Ny, Nx) starlet dictionary of a (B, Ny, Nx) cube.

    Ref: wavelet.py:269-281.
    """
    assert image.ndim == 3, f"Image should be 3D (bands, Ny, Nx), got {image.shape}"
    scales = get_scales(image.shape, scales)
    per_band = [
        starlet_transform(image[b], scales=scales, generation=generation,
                          convolve2D=convolve2D)
        for b in range(image.shape[0])
    ]
    return jnp.stack(per_band, axis=1)


def starlet_reconstruction(starlets, generation=2, convolve2D=None):
    """Inverse starlet transform. Ref: wavelet.py:284-311."""
    if generation == 1:
        return jnp.sum(starlets, axis=0)
    if convolve2D is None:
        convolve2D = bspline_convolve
    scales = len(starlets) - 1
    c = starlets[-1]
    for i in range(1, scales + 1):
        j = scales - i
        c = convolve2D(c, j) + starlets[j]
    return c


def multiband_starlet_reconstruction(starlets, generation=2, convolve2D=None):
    """Per-band inverse transform of a (scales+1, B, Ny, Nx) dictionary.

    Ref: wavelet.py:314-328 (whose body is broken; this is the working
    equivalent).
    """
    bands = starlets.shape[1]
    return jnp.stack(
        [
            starlet_reconstruction(starlets[:, b], generation=generation,
                                   convolve2D=convolve2D)
            for b in range(bands)
        ]
    )


class Starlet:
    """An image together with its starlet coefficients.

    Ref: scarlet/wavelet.py:5-150.
    """

    def __init__(self, image, coefficients, generation, convolve2D):
        self._image = image
        self._coeffs = coefficients
        self._generation = generation
        self._convolve2D = convolve2D
        self._norm = None

    @staticmethod
    def from_image(image, scales=None, generation=2, convolve2D=None):
        image = jnp.asarray(image)
        if scales is None:
            scales = get_scales(image.shape)
        coefficients = starlet_transform(image, scales, generation, convolve2D)
        return Starlet(image, coefficients, generation, convolve2D)

    @staticmethod
    def from_coefficients(coefficients, generation=2, convolve2D=None):
        image = starlet_reconstruction(coefficients, generation, convolve2D)
        return Starlet(image, coefficients, generation, convolve2D)

    @property
    def image(self):
        return self._image

    @image.setter
    def image(self, image):
        self._image = jnp.asarray(image)
        self._coeffs = starlet_transform(self._image, None, self._generation,
                                         self._convolve2D)
        self._norm = None

    @property
    def coefficients(self):
        return self._coeffs

    @coefficients.setter
    def coefficients(self, coeffs):
        self._coeffs = jnp.asarray(coeffs)
        self._image = starlet_reconstruction(self._coeffs, self._generation,
                                             self._convolve2D)

    @property
    def scales(self):
        return len(self._coeffs) - 1

    @property
    def generation(self):
        return self._generation

    @property
    def convolve2D(self):
        return self._convolve2D

    @property
    def norm(self):
        """L2 norm per scale of the starlet transform of a centered dirac;
        used to normalize sparsity thresholds.  Ref: wavelet.py:141-150.
        """
        if self._norm is None:
            shape = self._image.shape[-2:]
            cy, cx = shape[0] // 2, shape[1] // 2
            dirac = jnp.zeros(shape).at[cy, cx].set(1.0)
            seed = starlet_transform(dirac, scales=self.scales,
                                     generation=self._generation,
                                     convolve2D=self._convolve2D)
            self._norm = jnp.sqrt(jnp.sum(seed ** 2, axis=(-2, -1)))
        return self._norm


def get_multiresolution_support(image, starlets, sigma, K=3, epsilon=1e-1,
                                max_iter=20, image_type="ground"):
    """Significance masks (K-sigma clipping per scale) for starlet
    coefficients; ground and space variants.  Host-side (init-time only).

    Ref: wavelet.py:331-408.
    """
    assert image_type in ("ground", "space")
    image = np.asarray(image)
    starlets = np.asarray(starlets)

    if image_type == "space":
        noise_img = np.random.normal(size=image.shape)
        noise_starlet = np.asarray(
            starlet_transform(jnp.asarray(noise_img),
                              scales=len(starlets) - 1, generation=1)
        )
        sigma_je = np.array([np.std(star) for star in noise_starlet])
        noise = image - starlets[-1]
        last_sigma_i = sigma
        for _ in range(max_iter):
            M = np.abs(starlets) > K * sigma * sigma_je[:, None, None]
            S = np.sum(M, axis=0) == 0
            sigma_i = np.std(noise * S)
            if np.abs(sigma_i - last_sigma_i) / sigma_i < epsilon:
                break
            last_sigma_i = sigma_i
    else:
        sigma_j = np.ones((len(starlets),), dtype=image.dtype) * sigma
        last_sigma_j = sigma_j
        for _ in range(max_iter):
            M = np.abs(starlets) > K * sigma_j[:, None, None]
            S = ~M
            sigma_j = np.std(starlets * S.astype(int), axis=(1, 2))
            cut = sigma_j > 0
            if np.all(
                np.abs(sigma_j[cut] - last_sigma_j[cut]) / sigma_j[cut] < epsilon
            ):
                break
            last_sigma_j = sigma_j
    return M.astype(int)


def multiresolution_support_jax(starlets, sigma, K=3, epsilon=1e-1,
                                max_iter=20, valid=None):
    """Device (jit/vmap-safe) ground-type significance masks: the exact
    iteration of :func:`get_multiresolution_support` (``image_type=
    "ground"``, ref wavelet.py:331-408) as a ``lax.while_loop``.

    The host loop's early ``break`` is emulated by a convergence flag in
    the carry; the returned mask uses the sigma of the *last executed*
    iteration (what the host's ``M`` holds at break time).  ``valid`` is
    an optional (H, W) mask of real pixels for zero-padded layouts — the
    per-scale std then runs over valid pixels only, which reproduces the
    natural-crop computation exactly (the starlet transform's zero
    boundary makes zero padding transparent).

    Returns the (J, H, W) int mask.
    """
    import jax

    starlets = jnp.asarray(starlets)
    J = starlets.shape[0]
    dtype = starlets.dtype
    if valid is None:
        validb = jnp.ones(starlets.shape[-2:], bool)
    else:
        validb = jnp.asarray(valid) > 0
    n_valid = jnp.maximum(jnp.sum(validb), 1).astype(dtype)
    tiny = jnp.asarray(np.finfo(np.dtype(dtype).name).tiny, dtype)

    def masked_std(x):
        xm = jnp.where(validb, x, 0)
        mean = jnp.sum(xm, axis=(-2, -1)) / n_valid
        var = jnp.sum(
            jnp.where(validb, (x - mean[:, None, None]) ** 2, 0),
            axis=(-2, -1)) / n_valid
        return jnp.sqrt(var)

    sigma0 = jnp.full((J,), sigma, dtype)

    def cond(carry):
        _, _, done, it = carry
        return (~done) & (it < max_iter)

    def body(carry):
        sigma_cur, _, _, it = carry
        M = jnp.abs(starlets) > K * sigma_cur[:, None, None]
        S = (~M) & validb
        sigma_next = masked_std(starlets * S)
        cut = sigma_next > 0
        conv = jnp.all(jnp.where(
            cut,
            jnp.abs(sigma_next - sigma_cur)
            / jnp.maximum(sigma_next, tiny) < epsilon,
            True))
        return sigma_next, sigma_cur, conv, it + 1

    _, sigma_M, _, _ = jax.lax.while_loop(
        cond, body, (sigma0, sigma0, jnp.asarray(False),
                     jnp.asarray(0, jnp.int32)))
    return (jnp.abs(starlets) > K * sigma_M[:, None, None]).astype(jnp.int32)


def apply_wavelet_denoising(image, sigma=None, k=3, epsilon=1e-1, max_iter=20,
                            image_type="ground", positive=True):
    """Iterative starlet-domain denoising (Starck et al. 2011 section 4.1).

    Ref: wavelet.py:423-465.
    """
    image = np.asarray(image)
    image_coeffs = np.asarray(starlet_transform(jnp.asarray(image)))
    if sigma is None:
        sigma = np.median(np.absolute(image - np.median(image)))
    support = get_multiresolution_support(
        image, image_coeffs, sigma, k, epsilon, max_iter, image_type
    )
    x = np.asarray(starlet_reconstruction(jnp.asarray(image_coeffs)))
    for _ in range(max_iter):
        coeffs = np.asarray(starlet_transform(jnp.asarray(x)))
        x = x + np.asarray(
            starlet_reconstruction(jnp.asarray(support * (image_coeffs - coeffs)))
        )
        if positive:
            x[x < 0] = 0
    return x
