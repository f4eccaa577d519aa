"""Does the device-side convergence early exit pay off on real work?

The generated regression blends converge at e_rel=1e-4 well before the
100-iteration cap (medians 19-35 its — testing/baselines).  This measures
the SAME 256-blend heterogeneous stream twice on the chip:

  1. e_rel=1e-4 (production): the while-program stops at the first
     check_every boundary where every blend's |dL| < e_rel |L|;
  2. e_rel=0: convergence never fires — the fixed-cap wall-clock.

Prints one JSON line with both wall-clocks (median of 3) and the saving.
Run: python tools/early_exit_bench.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from scarlet_tpu import parallel

    import bench

    het = bench.make_heterogeneous(256)
    images, variance, psfs, centers, active = het
    model_psf = bench._model_psf()

    def run(e_rel, compact=None):
        return parallel.deblend_device_stream(
            images, variance, psfs, centers, model_psf,
            center_active=active, box_size=59, n_slots=bench.HET_SLOTS,
            max_iter=100, check_every=25, chunk=128, e_rel=e_rel,
            compact=compact)

    def timed(fn, n=3):
        fn()
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            times.append(time.perf_counter() - t0)
        return out, sorted(times)[n // 2], times

    (recs, _, _, _), t_early, times_e = timed(lambda: run(1e-4))
    iters = sorted(r["iterations"] for r in recs)
    (recsc, _, _, _), t_comp, times_k = timed(lambda: run(1e-4, compact=50))
    itersc = sorted(r["iterations"] for r in recsc)
    (recs0, _, _, _), t_cap, times_c = timed(lambda: run(0.0))
    iters0 = sorted(r["iterations"] for r in recs0)

    print(json.dumps({
        "n_blends": 256,
        "early_exit_s": round(t_early, 3),
        "early_exit_spread": [round(x, 3) for x in sorted(times_e)],
        "compacted_s": round(t_comp, 3),
        "compacted_spread": [round(x, 3) for x in sorted(times_k)],
        "fixed_cap_s": round(t_cap, 3),
        "fixed_cap_spread": [round(x, 3) for x in sorted(times_c)],
        "speedup_early_vs_cap": round(t_cap / t_early, 3),
        "speedup_compact_vs_cap": round(t_cap / t_comp, 3),
        "median_iterations_early": int(iters[len(iters) // 2]),
        "max_iterations_early": int(iters[-1]),
        "median_iterations_compact": int(itersc[len(itersc) // 2]),
        "median_iterations_cap": int(iters0[len(iters0) // 2]),
        "blends_per_min_early": round(256 / t_early * 60, 1),
        "blends_per_min_compact": round(256 / t_comp * 60, 1),
        "blends_per_min_cap": round(256 / t_cap * 60, 1),
    }))


if __name__ == "__main__":
    main()
