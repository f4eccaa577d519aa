"""Does a fit-time monotonicity decline (min_gradient) move the
crowded-field size bias?

The +12.8% rms size bias on hard set 5 (halved to +5.7% by the
non-default bg_thresh=0.25 — BASELINE r3/r4) is monotonic spread
absorbing neighbor flux.  min_gradient > 0 scales the mono reference
value by (1 - min_gradient) per step, forcing a strictly decreasing
radial profile (ref ExtendedSource min_grad) — compacter models should
absorb less.  A/B on set 5: {default, min_gradient 0.05/0.1/0.2, and
0.1 + bg_thresh} at unchanged photometry guards.

Run:  python tools/size_bias_mingrad_ab.py [cpu]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    if "cpu" in sys.argv[1:]:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scarlet_tpu import lite, parallel
    from scarlet_tpu.testing import api
    from scarlet_tpu.testing.measure import measure_flux_records

    paths = api.bundled_blends(5)
    datas = [np.load(p, allow_pickle=True) for p in paths]
    images, variances, psfs, centers_l = [], [], [], []
    for data in datas:
        im, var = api._load_image_variance(data)
        images.append(im)
        variances.append(var)
        psfs.append(np.asarray(data["psfs"]).astype(np.float32))
        centers_l.append([(int(np.round(r["y"])), int(np.round(r["x"])))
                          for r in data["catalog"]])
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

    variants = {
        "default": {},
        "mg_0.05": {"min_gradient": 0.05},
        "mg_0.1": {"min_gradient": 0.1},
        "mg_0.2": {"min_gradient": 0.2},
        "mg_0.1+bg": {"min_gradient": 0.1, "bg_thresh": 0.25},
    }

    result = {}
    for name, kw in variants.items():
        t0 = time.perf_counter()
        records, _, _, _ = parallel.deblend_device_stream(
            np.stack(images), np.stack(variances), np.stack(psfs), carr,
            model_psf, center_active=cact, box_size=box, n_slots=2 * K,
            max_iter=100, e_rel=1e-4, min_snr=30, reweight=True, **kw)
        wall = time.perf_counter() - t0

        size_diffs, mag_errs = [], []
        total_logL = 0.0
        for rec, data, cs in zip(records, datas, centers_l):
            k = len(cs)
            srcs = measure_flux_records(
                np.asarray(rec["flux"])[:k], data["catalog"],
                api._channels(data),
                centroids=np.asarray(rec["centroid"])[:k],
                moments=np.asarray(rec["moments"])[:k])
            total_logL += float(rec["logL"])
            for s in srcs:
                if "size diff" in s:
                    size_diffs.append(s["size diff"])
                if "r diff" in s:
                    mag_errs.append(abs(s["r diff"]))
        size_diffs = np.asarray(size_diffs)
        result[name] = {
            "n_sources_with_shape": int(size_diffs.size),
            "mean_size_bias": round(float(size_diffs.mean()), 4),
            "median_abs_size_diff": round(
                float(np.median(np.abs(size_diffs))), 4),
            "median_abs_r_mag_err": round(
                float(np.median(mag_errs)), 4) if mag_errs else None,
            "total_logL": round(total_logL, 1),
            "wall_s": round(wall, 2),
        }
        print(f"# {name}: {result[name]}", file=sys.stderr, flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
