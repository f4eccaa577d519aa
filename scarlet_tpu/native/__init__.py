"""ctypes bindings for the native host kernels.

Mirrors the reference's C++ extensions (operators_pybind11.cc,
detect_pybind11.cc) through a plain C ABI.  The library auto-builds on
first import if g++ is available; every entry point has a numpy fallback
in the pure-Python modules, so the package works without it.
"""
from __future__ import annotations

import ctypes
import pathlib

import numpy as np

__all__ = [
    "available",
    "prox_weighted_monotonic",
    "apply_filter",
    "get_valid_monotonic_pixels",
    "linear_interpolate_invalid_pixels",
    "label_components",
]

_HERE = pathlib.Path(__file__).parent
_LIB_PATH = _HERE / "libscarlet_tpu_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            from .build import build

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.prox_weighted_monotonic.argtypes = [
        f32p, f32p, i64p, i64p, i64, i64, ctypes.c_float]
    lib.apply_filter.argtypes = [
        f32p, f32p, i64, i64p, i64p, i64p, i64p, i64, i64, f32p]
    lib.get_valid_monotonic_pixels.argtypes = [
        f32p, i64, i64, i64, i64, u8p, u8p, ctypes.c_double, i32p,
        ctypes.c_double]
    lib.linear_interpolate_invalid_pixels.argtypes = [
        i64p, i64p, i64, u8p, f32p, u8p, i64, i64, ctypes.c_double,
        ctypes.c_int, i32p]
    lib.label_components.argtypes = [f32p, i64, i64, ctypes.c_double, i32p]
    lib.label_components.restype = i64

    _lib = lib
    return lib


def available():
    """Whether the native library is loaded (builds it if needed)."""
    return _load() is not None


def prox_weighted_monotonic(flat_img, weights, offsets, didx, min_gradient):
    """In-place sequential monotonicity sweep (reference semantics).

    flat_img: (N,) float32 (modified in place); weights: (8, N) float32;
    offsets: (8,) int64; didx: (M,) int64 sorted indices (excl. center).
    """
    lib = _load()
    flat_img = np.ascontiguousarray(flat_img, np.float32)
    weights = np.ascontiguousarray(weights, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    didx = np.ascontiguousarray(didx, np.int64)
    lib.prox_weighted_monotonic(flat_img, weights, offsets, didx,
                                len(didx), flat_img.size,
                                np.float32(min_gradient))
    return flat_img


def apply_filter(image, values, y_start, y_end, x_start, x_end):
    """Real-space sparse convolution via shifted block adds."""
    lib = _load()
    image = np.ascontiguousarray(image, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    H, W = image.shape
    result = np.zeros_like(image)
    lib.apply_filter(
        image, values, len(values),
        np.ascontiguousarray(y_start, np.int64),
        np.ascontiguousarray(y_end, np.int64),
        np.ascontiguousarray(x_start, np.int64),
        np.ascontiguousarray(x_end, np.int64),
        H, W, result)
    return result


def get_valid_monotonic_pixels(image, i, j, unchecked, orphans, variance,
                               bounds, thresh=0.0):
    """Iterative monotonic-path flood fill (in-place masks/bounds)."""
    lib = _load()
    image = np.ascontiguousarray(image, np.float32)
    H, W = image.shape
    lib.get_valid_monotonic_pixels(image, H, W, int(i), int(j), unchecked,
                                   orphans, float(variance), bounds,
                                   float(thresh))


def linear_interpolate_invalid_pixels(rows, cols, unchecked, model, orphans,
                                      variance, recursive, bounds):
    """Orphan interpolation + continued flood fill (in-place)."""
    lib = _load()
    H, W = model.shape
    lib.linear_interpolate_invalid_pixels(
        np.ascontiguousarray(rows, np.int64),
        np.ascontiguousarray(cols, np.int64),
        len(rows), unchecked, model, orphans, H, W, float(variance),
        int(bool(recursive)), bounds)


def label_components(image, thresh=0.0):
    """4-connected component labels of image > thresh; returns (labels, n)."""
    lib = _load()
    image = np.ascontiguousarray(image, np.float32)
    H, W = image.shape
    labels = np.zeros((H, W), np.int32)
    n = lib.label_components(image, H, W, float(thresh), labels)
    return labels, int(n)
