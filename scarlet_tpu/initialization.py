"""Source initialization: host-side (init-time) bootstrapping of spectra and
morphologies from data.  Behavioral reference: scarlet/initialization.py.

This module grows with the main-path API; the lite path uses
:mod:`scarlet_tpu.lite.initialization`.
"""
from __future__ import annotations

import logging

import numpy as np

from .bbox import Box

logger = logging.getLogger("scarlet_tpu.initialization")

__all__ = [
    "get_minimal_boxsize",
    "trim_morphology",
]


def get_minimal_boxsize(size, min_size=21, increment=10):
    """Bucket a size into {21, 31, 41, ...}: small and quantized so jit
    recompiles stay rare.  Ref: scarlet/initialization.py:173-177.
    """
    boxsize = min_size
    while boxsize < size:
        boxsize += increment
    return boxsize


def trim_morphology(center_index, morph, bg_thresh=0, boxsize=None):
    """Zero sub-threshold pixels and cut a centered odd box around the
    remaining flux.  Ref: scarlet/initialization.py:180-210.
    """
    morph = np.array(morph, copy=True)
    mask = morph > bg_thresh
    morph[~mask] = 0

    bbox = Box.from_data(morph, min_value=0)
    if bbox.contains(center_index):
        size = 2 * max(
            (
                center_index[0] - bbox.start[-2],
                bbox.stop[0] - center_index[-2],
                center_index[1] - bbox.start[-1],
                bbox.stop[1] - center_index[-1],
            )
        )
    else:
        size = 0

    if boxsize is None:
        boxsize = get_minimal_boxsize(size)

    bottom = center_index[0] - boxsize // 2
    top = center_index[0] + boxsize // 2 + 1
    left = center_index[1] - boxsize // 2
    right = center_index[1] + boxsize // 2 + 1
    bbox = Box.from_bounds((bottom, top), (left, right))
    morph = bbox.extract_from(morph)
    return morph, bbox
