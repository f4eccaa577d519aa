"""A/B: f32 vs bf16 upload dtype for the upload-included device stream.

Round-robin interleaved timing (the de-confounding methodology from the
sorted-stream probe, BASELINE r3 finding 5) of the heterogeneous bench
entry with upload_dtype=None vs jnp.bfloat16, plus record deltas.

Run on the TPU:  python tools/bf16_upload_bench.py [n_reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from scarlet_tpu import parallel
import bench


def run(het, model_psf, upload_dtype):
    images, variance, psfs, centers, active = het
    return parallel.deblend_device_stream(
        images, variance, psfs, centers, model_psf,
        center_active=active, box_size=59, n_slots=12,
        max_iter=100, check_every=25, chunk=128, compact=50,
        upload_dtype=upload_dtype)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    het = bench.make_heterogeneous(256)
    model_psf = bench._model_psf()
    nbytes = sum(x.nbytes for x in het[:3])
    print(f"raw stacks: {nbytes/1e6:.0f} MB f32, "
          f"{nbytes/2e6:.0f} MB as bf16")

    # warm both variants (compile + cache)
    r32, *_ = run(het, model_psf, None)
    r16, *_ = run(het, model_psf, jnp.bfloat16)

    dlogL = np.array([a["logL"] - b["logL"] for a, b in zip(r32, r16)])
    rel_flux = np.array([
        np.max(np.abs(np.asarray(a["flux"]) - np.asarray(b["flux"]))
               / (np.abs(np.asarray(a["flux"])).max() + 1e-9))
        for a, b in zip(r32, r16)])
    print(f"record deltas: logL mean {dlogL.mean():+.2f} "
          f"max|{np.abs(dlogL).max():.2f}| "
          f"(logL scale ~{np.mean([r['logL'] for r in r32]):.0f}); "
          f"flux rel err median {np.median(rel_flux):.4f} "
          f"p95 {np.percentile(rel_flux, 95):.4f}")

    times = {"f32": [], "bf16": []}
    for rep in range(reps):
        for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
            t0 = time.perf_counter()
            run(het, model_psf, dt)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med:.3f}s -> {256/med*60:.0f} blends/min "
              f"(all: {[f'{t:.2f}' for t in ts]})")
    m32 = sorted(times["f32"])[reps // 2]
    m16 = sorted(times["bf16"])[reps // 2]
    print(f"bf16/f32 speedup: {m32/m16:.3f}x")


if __name__ == "__main__":
    main()
