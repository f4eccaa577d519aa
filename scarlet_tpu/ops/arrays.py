"""Shared array helpers: zero-filled shifts.

One implementation of the pad-then-slice zero-boundary shift that the
monotonic-mask flood fill, the engine's neighbor references, the device
stream's symmetrization, and the starlet transform all need (previously
four private copies — a boundary-convention fix now propagates to every
caller).
"""
import jax.numpy as jnp

__all__ = ["shift_zero", "shift_axis"]


def shift_zero(x, dy, dx):
    """``out[..., y, x] = x[..., y+dy, x+dx]``, zero outside.

    Static integer shifts over the trailing two axes; any number of
    leading batch axes.
    """
    lead = ((0, 0),) * (x.ndim - 2)
    pad = lead + ((max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)))
    padded = jnp.pad(x, pad)
    H, W = x.shape[-2:]
    y0, x0 = max(0, dy), max(0, dx)
    return padded[..., y0:y0 + H, x0:x0 + W]


def shift_axis(x, k, axis):
    """``out[i] = x[i-k]`` along ``axis`` (shift toward larger indices
    for ``k > 0``), zero-filled; static integer ``k``."""
    if k == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    index = [slice(None)] * x.ndim
    if k > 0:
        pad[axis] = (k, 0)
        index[axis] = slice(0, n)
    else:
        pad[axis] = (0, -k)
        index[axis] = slice(-k, n - k)
    return jnp.pad(x, pad)[tuple(index)]
