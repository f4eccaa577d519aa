"""A/B the packed prox-chain kernel (LiteFitConfig.packed_prox_chain):
does moving the whole packed morphology prox chain + gating into one
aliased Pallas kernel kill the per-iteration carry transposes
(r4 profile: 2 x 0.70 ms = 26% of the fit step at B=128)?

Run on the TPU:  python tools/packed_chain_ab.py [reps] [batch]
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from scarlet_tpu import parallel

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    MAX_ITER = 100

    cpu = jax.devices("cpu")[0]
    d = bench.load_data()
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"],
                                  d["centers"])
        config0, data, state = blend.engine_setup(
            e_rel=1e-4, platform=jax.devices()[0].platform)
    bdata, bstate = parallel.replicate_blend(data, state, B)
    bstate = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(np.asarray(x)),
        bstate, is_leaf=lambda x: x is None)

    configs = {
        "baseline": config0,
        "chain": dataclasses.replace(config0, packed_prox_chain=True),
    }

    def run(cfg):
        out, losses = parallel.fit_batch_device_converged(
            bstate, bdata, cfg, MAX_ITER, check_every=25)
        jax.block_until_ready(out.last_loss)
        return out

    outs = {k: run(cfg) for k, cfg in configs.items()}   # compile + warm
    quality = {k: {"final_logL": round(float(jnp.median(o.last_loss)), 1)}
               for k, o in outs.items()}

    times = {k: [] for k in configs}
    for _ in range(reps):
        for k, cfg in configs.items():
            t0 = time.perf_counter()
            run(cfg)
            times[k].append(time.perf_counter() - t0)

    result = {}
    for k in configs:
        med = sorted(times[k])[reps // 2]
        result[k] = dict(quality[k],
                         blends_per_min=round(B / med * 60.0, 1),
                         spread_s=[round(x, 3) for x in sorted(times[k])])
    result["speedup"] = round(
        result["chain"]["blends_per_min"]
        / result["baseline"]["blends_per_min"], 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
