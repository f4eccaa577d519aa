"""Regression runner over blend sets.

Ref: scarlet/testing/api.py:158-259 — the reference pulls curated HSC blend
sets from AWS and deblends them in a serial per-blend loop
(testing/api.py:216-226); here the blend sets are the bundled datasets plus
deterministically *generated* sets (blendsets.py), and the batched "lite"
pipeline deblends an entire set as one vmapped fit.  Results land in the
local store.
"""
from __future__ import annotations

import pathlib
import time

import numpy as np

from .deblend import deblend
from .measure import (measure_sources, measure_lite_sources,
                      measure_flux_records)
from .store import save_records, save_residuals

__all__ = ["bundled_blends", "deblend_and_measure",
           "deblend_lite_batch", "deblend_stream_batch"]

_DATA_DIR = pathlib.Path("/root/reference/data")

# blend "sets": 1 = real HSC blend, 2 = matched-PSF sim, 3 = unmatched sim;
# 4/5/6 = generated synthetic sets at the reference's curated-set scale
# (100 well-modeled / 50 random / 14 hard, docs/regression.rst:4-12:
# set 6 is the 100-blend well-modeled analog, set 4 the 50 random, set 5
# the 14 hard)
_BUNDLED = {
    1: ["hsc_cosmos_35.npz"],
    2: ["psf_matched_sim.npz"],
    3: ["psf_unmatched_sim.npz"],
}
_GENERATED = {4: 50, 5: 14, 6: 100, 7: 25,   # 7: very crowded (beyond ref)
              8: 50,   # 8: Spergel profiles + elliptical PSFs +
              #           correlated noise (realism, blendsets.py)
              9: 50}   # 9: injected fakes on REAL HSC-COSMOS pixels —
#                           the curated sets' own recipe
#                           (ref docs/regression.rst:4-12)


def bundled_blends(set_id, root=None):
    """Paths of the blends in a set (generating synthetic sets on first
    use)."""
    if set_id == 9:
        from .blendsets import generate_real_blend_set

        return generate_real_blend_set(set_id, n=_GENERATED[set_id],
                                       root=root)
    if set_id in _GENERATED:
        from .blendsets import generate_blend_set

        return generate_blend_set(set_id, n=_GENERATED[set_id], root=root)
    return [
        _DATA_DIR / name
        for name in _BUNDLED.get(set_id, [])
        if (_DATA_DIR / name).exists()
    ]


def _load_image_variance(data):
    """(images, variance) float32 from a blend npz; a missing variance
    plane is estimated per band by MAD (the harness's noise proxy for
    simulated sets)."""
    im = np.asarray(data["images"]).astype(np.float32)
    if "variance" in data:
        var = np.asarray(data["variance"]).astype(np.float32)
    else:
        sigma = np.array([1.4826 * np.median(np.abs(b - np.median(b)))
                          for b in im])
        var = np.ones_like(im) * (sigma ** 2)[:, None, None]
    return im, var


def _channels(data):
    if "filters" not in data:
        return []
    return [f.decode() if isinstance(f, bytes) else str(f)
            for f in np.asarray(data["filters"]).tolist()]


def deblend_lite_batch(datas, max_iter=None, e_rel=None):
    """Deblend a whole set of blend dicts as ONE batched engine fit: host
    init per blend, heterogeneous pack, vmapped adaprox scan, write-back.

    Returns (blends, records).  This is the TPU-native replacement for the
    reference's serial loop (testing/api.py:216-226).
    """
    from . import settings
    from .. import lite, parallel

    if max_iter is None:
        max_iter = settings.max_iter
    if e_rel is None:
        e_rel = settings.e_rel

    t0 = time.perf_counter()
    blends = []
    for data in datas:
        images, variance = _load_image_variance(data)
        weights = (1.0 / np.maximum(variance, 1e-12)).astype(np.float32)
        psfs = np.asarray(data["psfs"]).astype(np.float32)
        model_psf = lite.integrated_circular_gaussian(sigma=0.8)[None].astype(
            np.float32)
        obs = lite.LiteObservation(images, variance, weights, psfs,
                                   model_psf=model_psf)
        centers = [(int(np.round(r["y"])), int(np.round(r["x"])))
                   for r in data["catalog"]]
        sources = lite.init_all_sources_main(obs, centers, min_snr=30)
        sources = lite.parameterize_sources(sources, obs,
                                            lite.init_adaprox_component)
        blends.append(lite.LiteBlend(sources, obs))
    init_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    config, bdata, bstate = parallel.pack_blends(blends, e_rel=e_rel)
    out_state, losses = parallel.fit_batch_converged(bstate, bdata, config,
                                                     max_iter)
    parallel.unpack_blends(blends, out_state, losses)
    fit_time = time.perf_counter() - t0

    records = []
    for bl in blends:
        records.append({
            "init time": init_time / max(len(blends), 1) * 1000,   # ms
            "runtime": fit_time / max(len(blends), 1)
            / max(len(bl.sources), 1) * 1000,                      # ms/src
            "total runtime": fit_time / max(len(blends), 1),       # s
            "iterations": int(bl.it),
            "init logL": float(bl.loss[0]) if bl.loss else float("nan"),
            "logL": float(bl.loss[-1]) if bl.loss else float("nan"),
            "skipped": [],
            "n_sources": len(bl.sources),
        })
    return blends, records


def deblend_stream_batch(datas, max_iter=None, e_rel=None, min_snr=30,
                         reweight=True):
    """Deblend a whole set through the DEVICE stream path
    (parallel.stream): batched on-device init + fit + flux measurement,
    zero per-blend host work.

    All blends in the set must share one (C, H, W) (the generated sets
    do); heterogeneous source counts pad through ``center_active``.
    Returns (records, flux, centroids, moments) with flux[i] the
    (K_i, C) per-source fluxes, centroids[i] the (K_i, 2) scene
    positions, and moments[i] the (K_i, 3) central 2nd moments.
    """
    from . import settings
    from .. import lite, parallel

    if max_iter is None:
        max_iter = settings.max_iter
    if e_rel is None:
        e_rel = settings.e_rel

    images, variances, centers_l = [], [], []
    psfs = []
    for data in datas:
        im, var = _load_image_variance(data)
        images.append(im)
        variances.append(var)
        psfs.append(np.asarray(data["psfs"]).astype(np.float32))
        centers_l.append([(int(np.round(r["y"])), int(np.round(r["x"])))
                          for r in data["catalog"]])
    shapes = {im.shape for im in images}
    if len(shapes) > 1:
        raise ValueError(f"stream sets need one shape, got {shapes}")
    B = len(images)
    K = max(len(c) for c in centers_l)
    carr = np.zeros((B, K, 2), np.int32)
    cact = np.zeros((B, K), bool)
    for b, cs in enumerate(centers_l):
        carr[b, :len(cs)] = cs
        cact[b, :len(cs)] = True
    C, H, W = images[0].shape
    cap = max(H, W) + 1
    box = cap if cap % 2 == 1 else cap - 1
    model_psf = lite.integrated_circular_gaussian(sigma=0.8)[None].astype(
        np.float32)

    t0 = time.perf_counter()
    records_raw, _, _, _ = parallel.deblend_device_stream(
        np.stack(images), np.stack(variances), np.stack(psfs), carr,
        model_psf, center_active=cact, box_size=box, n_slots=2 * K,
        max_iter=max_iter, e_rel=e_rel, min_snr=min_snr, reweight=reweight)
    total = time.perf_counter() - t0

    records, flux, cents, moms = [], [], [], []
    for b, raw in enumerate(records_raw):
        k = len(centers_l[b])
        records.append({
            "init time": 0.0,       # device init is part of the one program
            "runtime": total / B / max(k, 1) * 1000,               # ms/src
            "total runtime": total / B,                            # s
            "iterations": int(raw["iterations"]),
            "init logL": float(raw["init logL"]),
            "logL": float(raw["logL"]),
            "skipped": [],
            "n_sources": k,
        })
        flux.append(np.asarray(raw["flux"])[:k])
        cents.append(np.asarray(raw["centroid"])[:k])
        moms.append(np.asarray(raw["moments"])[:k])
    return records, flux, cents, moms


def detection_quality(set_ids=(4, 5, 6), root=None, paths=None,
                      device=True, match_radius=3.0, scales=3):
    """Score the detection stage against each set's truth catalogs.

    Runs the starlet-footprint peak catalog recipe (device:
    `parallel.detect_peaks_device` as one batched program per set; host:
    `detect.get_peaks` per blend — bit-identical peak sets, tested) on
    every blend and matches detections to the truth catalog within
    ``match_radius`` px (:func:`measure.detection_metrics`).

    The reference never scores its detection stage (detect_pybind11.cc
    ships untested); completeness / false-positive rates are the
    standard survey metrics for it.

    Returns {set_id: {"blends": [per-blend metrics], "completeness",
    "false_rate", "median_match_dist"}}.
    """
    import jax

    from .measure import detection_metrics

    results = {}
    with jax.default_device(jax.devices("cpu")[0]):
        for set_id in set_ids:
            blend_paths = paths or bundled_blends(set_id)
            datas = [np.load(p, allow_pickle=True) for p in blend_paths]
            truths, ims, vars_ = [], [], []
            for data in datas:
                cat = data["catalog"]
                truths.append(np.stack([np.asarray(cat["y"], float),
                                        np.asarray(cat["x"], float)],
                                       axis=1))
                im, var = _load_image_variance(data)
                ims.append(im)
                vars_.append(var)

            if device and len({im.shape for im in ims}) == 1:
                from .. import parallel

                max_peaks = max(32, max(len(t) for t in truths) + 8)
                cen, act, _ = parallel.detect_peaks_device(
                    np.stack(ims), np.stack(vars_), max_peaks=max_peaks,
                    scales=scales)
                cen, act = np.asarray(cen), np.asarray(act)
                detected = [c[a] for c, a in zip(cen, act)]
            else:
                from ..detect import get_peaks

                detected = [np.asarray(get_peaks(images=im, variance=var,
                                                 scales=scales),
                                       float).reshape(-1, 2)
                            for im, var in zip(ims, vars_)]

            blends = [detection_metrics(t, d, match_radius=match_radius)
                      for t, d in zip(truths, detected)]
            n_truth = sum(m["n_truth"] for m in blends)
            n_det = sum(m["n_detected"] for m in blends)
            n_match = sum(m["n_matched"] for m in blends)
            dists = [m["match_dist"] for m in blends
                     if np.isfinite(m["match_dist"])]
            results[set_id] = {
                "blends": blends,
                "n_truth": n_truth,
                "n_detected": n_det,
                "n_matched": n_match,
                "completeness": n_match / n_truth if n_truth else 1.0,
                "false_rate": (n_det - n_match) / n_det if n_det else 0.0,
                "median_match_dist": float(np.median(dists)) if dists
                else float("nan"),
                "path": "device" if device else "host",
            }
    return results


def deblend_and_measure(set_ids=(1, 2, 3), save=True, save_images=False,
                        branch=None, root=None, paths=None, pipeline="main",
                        max_iter=None, e_rel=None):
    """Deblend every blend in the given sets, measure, and store records.

    ``pipeline``: "main" runs the reference-parity per-blend pipeline
    (testing/deblend.py:9-93 semantics); "lite" runs each set as one
    batched engine fit (:func:`deblend_lite_batch`); "stream" runs each
    set through the device stream path (:func:`deblend_stream_batch`).

    Returns {set_id: [record, ...]}.
    """
    import jax

    results = {}
    with jax.default_device(jax.devices("cpu")[0]):
        for set_id in set_ids:
            blend_paths = paths or bundled_blends(set_id)
            datas = [np.load(p, allow_pickle=True) for p in blend_paths]

            if pipeline == "stream":
                records, fluxes, cents, moms = deblend_stream_batch(
                    datas, max_iter=max_iter, e_rel=e_rel)
                for rec, data, path, fl, ce, mo in zip(records, datas,
                                                       blend_paths,
                                                       fluxes, cents,
                                                       moms):
                    rec["sources"] = measure_flux_records(
                        fl, data["catalog"], _channels(data),
                        centroids=ce, moments=mo)
                    rec["blend"] = pathlib.Path(path).name
            elif pipeline == "lite":
                blends, records = deblend_lite_batch(datas, max_iter=max_iter,
                                                     e_rel=e_rel)
                for rec, data, path, bl in zip(records, datas, blend_paths,
                                               blends):
                    rec["sources"] = measure_lite_sources(
                        bl.sources, data["catalog"], _channels(data))
                    rec["blend"] = pathlib.Path(path).name
            else:
                records = []
                for blend_id, (data, path) in enumerate(
                        zip(datas, blend_paths)):
                    sources, blend, record = deblend(data, max_iter=max_iter,
                                                     e_rel=e_rel)
                    record["sources"] = measure_sources(
                        sources, data["catalog"], _channels(data),
                        psf_var=record["model_psf_var"])
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
