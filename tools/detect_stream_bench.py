"""Measure the cost of device-side detection in the production stream.

Compares, on the attached accelerator with device-resident inputs (so
tunnel upload weather cancels out):

1. the homogeneous e2e stream with an explicit catalog (bench.py's
   end_to_end configuration),
2. the same stream with ``centers=None`` (detection on device), and
3. detection alone (``detect_peaks_device`` on the full batch).

Prints one JSON line.  Run:  python tools/detect_stream_bench.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N = 256
REPS = 3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from scarlet_tpu import parallel

    d = bench.load_data()
    variants = bench.make_variants(d, N)
    images = np.stack([v[0] for v in variants])
    variance = np.stack([v[1] for v in variants])
    psfs = np.stack([v[2] for v in variants])
    centers = np.stack([np.asarray(v[3]) for v in variants])
    model_psf = bench._model_psf()

    dev = jax.device_put((images, variance, psfs))
    jax.block_until_ready(dev)
    dimages, dvar, dpsfs = dev

    def run(cent):
        return parallel.deblend_device_stream(
            dimages, dvar, dpsfs, cent, model_psf, box_size=59,
            n_slots=10, max_iter=100, check_every=25, chunk=128)

    def timed(fn):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[REPS // 2], sorted(ts)

    run(centers)           # warmup catalog path
    run(None)              # warmup detection path

    cat_s, cat_ts = timed(lambda: run(centers))
    det_s, det_ts = timed(lambda: run(None))

    def detect_only():
        out = parallel.detect_peaks_device(dimages, dvar, max_peaks=10)
        jax.block_until_ready(out)
        return out

    detect_only()
    only_s, only_ts = timed(detect_only)

    _, _, n_found = detect_only()
    print(json.dumps({
        "n_blends": N,
        "catalog_blends_per_min": round(N / cat_s * 60.0, 1),
        "detect_blends_per_min": round(N / det_s * 60.0, 1),
        "detection_overhead_pct": round(100.0 * (det_s - cat_s) / cat_s, 2),
        "detect_only_s": round(only_s, 4),
        "detect_only_ms_per_blend": round(only_s / N * 1e3, 3),
        "median_peaks": int(np.median(np.asarray(n_found))),
        "spread_catalog_s": [round(x, 3) for x in cat_ts],
        "spread_detect_s": [round(x, 3) for x in det_ts],
        "spread_detect_only_s": [round(x, 4) for x in only_ts],
    }))


if __name__ == "__main__":
    main()
