"""Regression runner over blend sets.

Ref: scarlet/testing/api.py:158-259 — the reference pulls curated HSC blend
sets from AWS; here the blend sets are the bundled datasets (plus any
user-provided list of npz paths), and results land in the local store.
"""
from __future__ import annotations

import pathlib

import numpy as np

from .deblend import deblend
from .measure import measure_sources
from .store import save_records, save_residuals

__all__ = ["bundled_blends", "deblend_and_measure"]

_DATA_DIR = pathlib.Path("/root/reference/data")

# blend "sets": 1 = real HSC blend, 2 = matched-PSF sim, 3 = unmatched sim
_BUNDLED = {
    1: ["hsc_cosmos_35.npz"],
    2: ["psf_matched_sim.npz"],
    3: ["psf_unmatched_sim.npz"],
}


def bundled_blends(set_id):
    """Paths of the bundled blends in a set."""
    return [
        _DATA_DIR / name
        for name in _BUNDLED.get(set_id, [])
        if (_DATA_DIR / name).exists()
    ]


def deblend_and_measure(set_ids=(1, 2, 3), save=True, save_images=False,
                        branch=None, root=None, paths=None):
    """Deblend every blend in the given sets, measure, and store records.

    Returns {set_id: [record, ...]}.
    """
    import jax

    results = {}
    with jax.default_device(jax.devices("cpu")[0]):
        for set_id in set_ids:
            blend_paths = paths or bundled_blends(set_id)
            records = []
            for blend_id, path in enumerate(blend_paths):
                data = np.load(path, allow_pickle=True)
                sources, blend, record = deblend(data)
                channels = [
                    f.decode() if isinstance(f, bytes) else str(f)
                    for f in np.asarray(data["filters"]).tolist()
                ] if "filters" in data else []
                record["sources"] = measure_sources(sources, data["catalog"],
                                                    channels)
                record["blend"] = pathlib.Path(path).name
                records.append(record)
                if save_images:
                    obs = blend.observations[0]
                    model = np.asarray(obs.render(blend.get_model()))
                    save_residuals(obs.data, model, set_id, blend_id,
                                   branch=branch, root=root)
            if save and records:
                save_records(records, set_id, branch=branch, root=root)
            results[set_id] = records
    return results
