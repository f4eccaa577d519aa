"""Roofline calibration of the packed monotonicity kernel (VERDICT r4 #3).

Measures the kernel's per-Jacobi-pass cost directly: times the standalone
packed kernel at several FORCED pass counts (the dynamic-tol path with
tol = -1 never exits early, so the while loop runs exactly ``n_iter``
passes) at the production shapes (B=128 blends x 10 slots x 59x59,
lane-packed (59, 590)), fits time = overhead + tau * passes, and converts
tau into achieved VPU element-op throughput vs the v5e peak.

Also inverts the production xplane number (3.81 ms/iter at B=128 for the
exact-semantics kernel, BASELINE r3 closing profile) into the implied
average executed pass count P-bar = (t_call - overhead) / tau.

Usage:  python tools/roofline_mono.py [--prod-ms-per-iter 3.81] [--cpu]
Writes one JSON line; the arithmetic appears in BASELINE.md "Roofline".
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prod-ms-per-iter", type=float, default=3.81,
                    help="measured production mono time per fit iteration "
                         "at B=128 (xplane, BASELINE r3 closing profile)")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU interpret-mode smoke run (numbers are "
                         "meaningless, only checks the harness)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    import jax

    # persistent compile cache: variant kernels recompile across
    # reruns otherwise (tunnel compiles dominate tool wall time)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from scarlet_tpu.lite import engine
    from scarlet_tpu.ops.pallas_kernels import monotonic_prox_packed

    # production shapes: hsc_cosmos_35 stream config (S=59, 10 slots)
    S, K, B = 59, 10, args.batch
    wtab, keep, depth = engine.monotonicity_tables((S, S), 1, "angle")
    wtab = jnp.asarray(wtab, jnp.float32)
    keep = jnp.asarray(keep, jnp.float32)
    idx = jnp.zeros((K,), jnp.int32)
    rng = np.random.RandomState(0)
    packed = jnp.asarray(rng.rand(B, S, K * S).astype(np.float32))
    # forced pass count: dynamic-tol exit max|delta| > -1 is always true
    never = jnp.asarray(-1.0, jnp.float32)

    def run(n_iter):
        f = jax.jit(jax.vmap(
            lambda p: monotonic_prox_packed(
                p, idx, wtab, keep, S, n_iter,
                interpret=bool(args.cpu), tol_arr=never)))
        out = f(packed)
        jax.block_until_ready(out)        # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(packed))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), float(np.min(ts)), float(np.max(ts))

    # large spread: the standalone-call floor (~26 ms: tunnel dispatch +
    # sync) dwarfs the per-pass cost, so the slope needs a wide lever arm
    counts = [8, 88, 200, 352]
    med = {}
    rows = []
    for n in counts:
        m, lo, hi = run(n)
        med[n] = m
        rows.append({"passes": n, "median_s": round(m, 6),
                     "min_s": round(lo, 6), "max_s": round(hi, 6)})
        print(f"passes={n:3d}  median {m*1e3:8.3f} ms  "
              f"[{lo*1e3:.3f}, {hi*1e3:.3f}]", file=sys.stderr)

    # least-squares line through (passes, batch time)
    xs = np.array(counts, float)
    ys = np.array([med[n] for n in counts])
    A = np.vstack([xs, np.ones_like(xs)]).T
    (tau_batch, ovh_batch), *_ = np.linalg.lstsq(A, ys, rcond=None)
    tau_call = tau_batch / B               # per-pass per-call (one blend)
    ovh_call = ovh_batch / B
    r2 = 1 - np.sum((A @ [tau_batch, ovh_batch] - ys) ** 2) / np.sum(
        (ys - ys.mean()) ** 2)

    # element-op accounting per pass (kernel step(): 8 mul + 5 + 2 adds,
    # 1 min, 1 select = 17 arithmetic vector ops; + 4 pltpu.rolls of the
    # full array = 21 vector instructions touching every element)
    elems = S * (K * S)                    # algorithmic (59 x 590)
    elems_pad = 64 * 640                   # Mosaic (8,128)-tile padding
    ops_arith = 17 * elems
    ops_hw = 21 * elems_pad
    achieved_arith = ops_arith / tau_call
    achieved_hw = ops_hw / tau_call
    # v5e VPU: (8,128) lanes x 4 ALUs at 940 MHz
    vpu_peak = 8 * 128 * 4 * 0.94e9

    # production mono runs INSIDE the fused fit program (no standalone
    # dispatch floor), so the implied executed pass count divides by the
    # slope alone
    prod_call_s = args.prod_ms_per_iter / 1e3 / B
    implied_passes = prod_call_s / tau_call

    out = {
        "metric": "mono_kernel_roofline",
        "shape": f"B{B} x (59,590) f32, 10 slots",
        "fit": rows,
        "tau_us_per_pass_per_call": round(tau_call * 1e6, 4),
        "overhead_us_per_call": round(ovh_call * 1e6, 3),
        "r2": round(float(r2), 5),
        "arith_ops_per_pass_per_call": ops_arith,
        "achieved_arith_Top_s": round(achieved_arith / 1e12, 3),
        "achieved_hw_Top_s_padded_incl_rolls": round(achieved_hw / 1e12, 3),
        "v5e_vpu_peak_Top_s": round(vpu_peak / 1e12, 3),
        "vpu_fraction_hw": round(achieved_hw / vpu_peak, 3),
        "vpu_fraction_arith": round(achieved_arith / vpu_peak, 3),
        "prod_ms_per_iter": args.prod_ms_per_iter,
        "implied_avg_passes_production": round(float(implied_passes), 1),
        "dag_depth_bound": 89,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
