"""Throughput of the wavelet-recipe device stream vs the main recipe.

The wavelet init (device starlet dictionaries + multiresolution support
masks, ref scarlet/lite/initialization.py:422-605) costs more than the
chi^2-coadd main recipe; this measures how much of the end-to-end rate
that costs on the heterogeneous bench set.  Round-robin interleaved
timing (BASELINE r3 finding 5 methodology), device-resident inputs so
tunnel weather cancels.

Run on the TPU:  python tools/wavelet_stream_bench.py [n_reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/scarlet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scarlet_tpu import parallel
import bench


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    het = bench.make_heterogeneous(256)
    images, variance, psfs, centers, active = het
    model_psf = bench._model_psf()

    dev = [jax.device_put(x) for x in (images, variance, psfs)]
    jax.block_until_ready(dev)

    def run(recipe):
        recs, *_ = parallel.deblend_device_stream(
            dev[0], dev[1], dev[2], centers, model_psf,
            center_active=active, box_size=59, n_slots=12,
            max_iter=100, check_every=25, chunk=128, compact=50,
            recipe=recipe)
        return recs

    out = {}
    for recipe in ("main", "wavelets"):
        out[recipe] = run(recipe)      # warm/compile
    logl = {k: np.median([r["logL"] for r in v]) for k, v in out.items()}
    its = {k: np.median([r["iterations"] for r in v]) for k, v in out.items()}
    print(f"median logL: main {logl['main']:.1f}, "
          f"wavelets {logl['wavelets']:.1f}; median iterations: "
          f"main {its['main']:.0f}, wavelets {its['wavelets']:.0f}")

    times = {"main": [], "wavelets": []}
    for _ in range(reps):
        for recipe in ("main", "wavelets"):
            t0 = time.perf_counter()
            run(recipe)
            times[recipe].append(time.perf_counter() - t0)
    for recipe, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{recipe}: median {med:.3f}s -> {256/med*60:.0f} blends/min "
              f"(all: {[f'{t:.2f}' for t in ts]})")


if __name__ == "__main__":
    main()
