"""A/B the DFT-conv matmul precision tier on the production steady fit.

The shipped default `conv_precision="float32"` maps to XLA HIGHEST,
which on TPU implements f32-equivalent matmuls from bf16 passes (6 on
most generations).  `"high"` (aka bfloat16_3x) is the untried MIDDLE
tier — 3 passes, error ~2^-21 relative vs the 1-pass tier's ~2^-8 that
made `"default"` a measured quality negative (logL -8857 vs -8619,
BASELINE r3).  If "high" times like "default" but matches "float32"
records, it's a free accelerator default like mono_tol=1e-3 was.

Reports, per arm: median fit wall (B=128, cap 100, interleaved rounds),
summed final loss, max per-blend |logL drift| vs the float32 arm.

Usage: python tools/conv_precision_ab.py [--rounds 3] [--reps 3]
"""
import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

ARMS = ("float32", "high", "default")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import batch as batch_mod
    import bench

    d = bench.load_data()
    cpu = jax.devices("cpu")[0]
    plat = jax.devices()[0].platform
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"],
                                  d["centers"])
        config, data, state = blend.engine_setup(e_rel=1e-4, platform=plat)

    B = args.batch
    bdata, bstate0 = parallel.replicate_blend(data, state, B)
    bstate0 = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(np.asarray(x)),
        bstate0, is_leaf=lambda x: x is None)
    jax.block_until_ready(jax.tree.leaves(bstate0))

    def fit(cfg):
        st = jax.tree.map(lambda x: None if x is None else jnp.copy(x),
                          bstate0, is_leaf=lambda x: x is None)
        return batch_mod._fit_batch_while_jit(st, bdata, cfg, 100, 25)

    cfgs = {p: dataclasses.replace(config, conv_precision=p) for p in ARMS}
    # warm all programs first so rounds time execution only
    outs = {}
    for p in ARMS:
        outs[p] = fit(cfgs[p])
        jax.block_until_ready(jax.tree.leaves(outs[p]))
        print(f"warm {p} done", flush=True)

    times = {p: [] for p in ARMS}
    for r in range(args.rounds):
        for p in ARMS:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                o = fit(cfgs[p])
                jax.block_until_ready(jax.tree.leaves(o))
                times[p].append(time.perf_counter() - t0)
            print(f"round {r} {p}: "
                  f"{['%.0f' % (t * 1e3) for t in times[p][-args.reps:]]} ms",
                  flush=True)
            outs[p] = o

    # ONE fused fetch of the final losses for the quality comparison
    losses = jax.device_get({p: outs[p][0].last_loss for p in ARMS})
    ref = np.asarray(losses["float32"], np.float64)
    med = {p: float(np.median(t)) for p, t in times.items()}
    out = {
        "metric": "conv_precision_ab",
        "batch": B,
        "medians_ms": {p: round(med[p] * 1e3, 1) for p in ARMS},
        "blends_per_min": {p: round(B / med[p] * 60, 0) for p in ARMS},
        "speedup_vs_float32": {p: round(med["float32"] / med[p], 4)
                               for p in ARMS},
        "sum_logL": {p: round(-float(np.sum(losses[p])), 1) for p in ARMS},
        "max_abs_logL_drift": {
            p: float(np.max(np.abs(np.asarray(losses[p], np.float64) - ref)))
            for p in ARMS},
        "bitwise_identical_loss": {
            p: bool(np.array_equal(np.asarray(losses[p]), ref.astype(
                np.asarray(losses[p]).dtype))) for p in ARMS},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
