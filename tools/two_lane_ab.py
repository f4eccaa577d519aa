"""Two-lane slot layout A/B at the r4 defaults (VERDICT r4 #4).

Padding waste is 50.7% at n_slots=16 (mean 7.9 active components in 16
slots, BENCH_r04) and ~80% of iteration time is linear in the slot
count.  The r3 rejection of slot grouping (BASELINE r3 finding 6: only
1.051x on the eligible subset, 12-vs-8 slots) predates the 16-slot move
and the fused record fetch — re-probe as a FULL-STREAM two-lane layout:

  single lane : all 256 blends at n_slots=16 (the bench default)
  two lanes   : a setup pre-pass reads n_active, then the <=8-component
                blends fit at n_slots=8 and the rest at n_slots=16;
                the pre-pass cost COUNTS toward the two-lane arm (it is
                the price of knowing the partition)

Device-resident stacks, interleaved round-robin timing.
Run on TPU:  python tools/two_lane_ab.py [reps]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import stream as stream_mod

    import bench

    images, variance, psfs, centers, active = bench.make_heterogeneous(256)
    model_psf = bench._model_psf()
    d_im = jax.device_put(images)
    d_va = jax.device_put(variance)
    d_ps = jax.device_put(psfs)
    jax.block_until_ready((d_im, d_va, d_ps))

    def setup_pass():
        _, _, _, aux = stream_mod.stream_setup(
            d_im, d_va, d_ps, centers, model_psf, center_active=active,
            box_size=59, n_slots=16)
        return np.asarray(aux["n_active"])

    n_active = setup_pass()
    small = np.nonzero(n_active <= 8)[0]
    big = np.nonzero(n_active > 8)[0]
    print(json.dumps({"n_small": int(len(small)), "n_big": int(len(big)),
                      "mean_active": round(float(n_active.mean()), 2)}),
          flush=True)

    def run_lane(order, n_slots):
        o = jnp.asarray(order)
        return parallel.deblend_device_stream(
            d_im[o], d_va[o], d_ps[o], centers[order], model_psf,
            center_active=active[order], box_size=59, n_slots=n_slots,
            max_iter=100, check_every=25, chunk=128, e_rel=1e-4,
            compact=50, retry_overflow=True)

    def run_single():
        return run_lane(np.arange(256), 16)

    def run_two():
        na = setup_pass()                       # honest pre-pass cost
        s = np.nonzero(na <= 8)[0]
        b = np.nonzero(na > 8)[0]
        r1 = run_lane(s, 8)
        r2 = run_lane(b, 16)
        return r1, r2

    run_single()
    run_two()                                   # warm both arms
    times = {"single": [], "two": []}
    logl = {}
    for _ in range(reps):
        for arm, fn in (("single", run_single), ("two", run_two)):
            t0 = time.perf_counter()
            out = fn()
            times[arm].append(time.perf_counter() - t0)
        recs = out[0][0] + out[1][0] if arm == "two" else out[0]
    # median logL sanity per arm (from the last rep of each)
    r_single = run_single()[0]
    r_two = run_two()
    logl["single"] = round(float(np.median(
        [r["logL"] for r in r_single])), 2)
    logl["two"] = round(float(np.median(
        [r["logL"] for r in r_two[0][0] + r_two[1][0]])), 2)

    med = {k: float(np.median(v)) for k, v in times.items()}
    print(json.dumps({
        "metric": "two_lane_ab",
        "single_s": [round(t, 3) for t in times["single"]],
        "two_s": [round(t, 3) for t in times["two"]],
        "single_bpm": round(256 / med["single"] * 60, 1),
        "two_bpm": round(256 / med["two"] * 60, 1),
        "two_lane_speedup": round(med["single"] / med["two"], 3),
        "median_logl": logl,
    }))


if __name__ == "__main__":
    main()
