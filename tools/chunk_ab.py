"""Chunk-size sweep for the device stream (the one stream-level knob
never A/B'd: BASELINE r2 chose chunk=128 for upload pipelining, but the
device-resident configuration may prefer fewer, larger programs).

Sweeps ``chunk`` over the bench het configuration (256 generated blends,
n_slots=16, compact=50, retry_overflow=True, device-resident) and the
homogeneous e2e configuration (256 hsc variants, n_slots=10), medians of
``reps``.

Run on TPU:  python tools/chunk_ab.py [reps] [chunks...]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, reps):
    import jax

    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], times


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    chunks = ([int(c) for c in sys.argv[2:]] if len(sys.argv) > 2
              else [64, 128, 256])
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scarlet_tpu import parallel

    import bench

    t00 = time.perf_counter()

    def t(msg):
        print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", file=sys.stderr,
              flush=True)

    out = {"reps": reps, "chunks": chunks}

    # ---- heterogeneous (the bench het config, device-resident) ----
    het_images, het_var, het_psfs, het_centers, het_active = \
        bench.make_heterogeneous(bench.N_HET)
    model_psf = bench._model_psf()
    dev = [jax.device_put(x) for x in (het_images, het_var, het_psfs)]
    jax.block_until_ready(dev)
    N = bench.N_HET
    t("het inputs on device")

    out["het"] = {}
    for c in chunks:
        def run(c=c):
            return parallel.deblend_device_stream(
                dev[0], dev[1], dev[2], het_centers, model_psf,
                center_active=het_active, box_size=59,
                n_slots=bench.HET_SLOTS, max_iter=bench.MAX_ITER,
                check_every=25, chunk=c, compact=50, retry_overflow=True)

        med, times = timed(run, reps)
        out["het"][c] = {"s": round(med, 3),
                         "blends_per_min": round(N / med * 60.0, 1),
                         "spread": [round(x, 3) for x in sorted(times)]}
        t(f"het chunk={c}: {out['het'][c]}")
    del dev

    # ---- homogeneous e2e (the bench hsc-variant config) ----
    d = bench.load_data()
    variants = bench.make_variants(d, bench.N_E2E)
    e2e = [np.stack([v[i] for v in variants]) for i in range(3)]
    e2e_centers = np.stack([np.asarray(v[3]) for v in variants])
    dev = jax.device_put(tuple(e2e))
    jax.block_until_ready(dev)
    t("e2e inputs on device")

    out["e2e"] = {}
    for c in chunks:
        def run(c=c):
            return parallel.deblend_device_stream(
                dev[0], dev[1], dev[2], e2e_centers, model_psf,
                box_size=59, n_slots=10, max_iter=bench.MAX_ITER,
                check_every=25, chunk=c)

        med, times = timed(run, reps)
        out["e2e"][c] = {"s": round(med, 3),
                         "blends_per_min": round(
                             bench.N_E2E / med * 60.0, 1),
                         "spread": [round(x, 3) for x in sorted(times)]}
        t(f"e2e chunk={c}: {out['e2e'][c]}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
