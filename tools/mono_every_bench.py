"""A/B the N-th-iteration monotonicity projection (LiteFitConfig.mono_every).

Post layout fix the mono kernel is ~81% of the fit iteration at the
exact-semantics floor (depth-89 Jacobi, VPU-saturated; BASELINE r4).  The
only lever past the per-projection tolerance (mono_tol, +17% at 1e-3) is
projecting less often: mono_every=N runs the FULL projection every N-th
iteration and one 4-pass block otherwise (huge traced tol), with
convergence freezing restricted to full-projection iterations.  Ceiling
at N=2 is ~1.6x steady if quality holds — this measures throughput +
final logL + per-source flux deviation, round-robin interleaved
(BASELINE r3 finding 5 methodology).

Run on the TPU:  python tools/mono_every_bench.py [reps]
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

EVERY = (1, 2, 3)
B = 128
MAX_ITER = 100


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from scarlet_tpu import parallel

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    cpu = jax.devices("cpu")[0]
    d = bench.load_data()
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"],
                                  d["centers"])
        config0, data, state = blend.engine_setup(
            e_rel=1e-4, platform=jax.devices()[0].platform)
    # production accelerator default tolerance (bench steady config)
    config0 = dataclasses.replace(config0, mono_tol=1e-3)
    bdata, bstate = parallel.replicate_blend(data, state, B)
    bstate = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(np.asarray(x)),
        bstate, is_leaf=lambda x: x is None)

    def run(cfg):
        out, losses = parallel.fit_batch_device_converged(
            bstate, bdata, cfg, MAX_ITER, check_every=25)
        jax.block_until_ready(out.last_loss)
        return out, losses

    configs = {n: dataclasses.replace(config0, mono_every=n)
               for n in EVERY}
    outs = {}
    for n, cfg in configs.items():            # compile + warm
        outs[n] = run(cfg)

    def fluxes(out):
        return np.asarray(
            jnp.sum(out.seds[0][0] * jnp.sum(out.morphs[0][0],
                                             axis=(-2, -1))[:, None],
                    axis=-1))

    ref_out, _ = outs[1]
    ref_flux = fluxes(ref_out)
    quality = {}
    for n, (out, losses) in outs.items():
        dev = np.abs(fluxes(out) - ref_flux) / np.maximum(
            np.abs(ref_flux), 1e-6)
        quality[n] = {
            "final_logL": round(float(jnp.median(out.last_loss)), 1),
            "flux_dev_median": round(float(np.median(dev)), 5),
            "flux_dev_max": round(float(np.max(dev)), 5),
            "iters": int(losses.shape[0]),
        }

    times = {n: [] for n in EVERY}
    for _ in range(reps):
        for n, cfg in configs.items():
            t0 = time.perf_counter()
            run(cfg)
            times[n].append(time.perf_counter() - t0)

    result = {}
    for n in EVERY:
        med = sorted(times[n])[reps // 2]
        result[str(n)] = dict(
            quality[n],
            blends_per_min=round(B / med * 60.0, 1),
            spread_s=[round(x, 3) for x in sorted(times[n])],
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
