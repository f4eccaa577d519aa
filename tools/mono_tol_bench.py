"""A/B the mono-kernel tolerance early-exit (LiteFitConfig.mono_tol).

The kernel's default exit is the bitwise fixed point of the exact
depth-N Jacobi DAG; with monotonicity at ~69% of the fit iteration an
epsilon exit is the one remaining compute lever (VERDICT r3 #6).  This
measures throughput + final logL + per-source flux deviation at several
tolerances, round-robin interleaved (BASELINE r3 finding 5 methodology).

Run on the TPU:  python tools/mono_tol_bench.py [reps]
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

TOLS = (0.0, 1e-4, 1e-3, 1e-2)
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
    from scarlet_tpu.parallel.stream import stream_records

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

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

    def run(cfg):
        out, losses = parallel.fit_batch_device_converged(
            bstate, bdata, cfg, MAX_ITER, check_every=25)
        jax.block_until_ready(out.last_loss)
        return out, losses

    configs = {tol: dataclasses.replace(config0, mono_tol=tol)
               for tol in TOLS}
    outs = {}
    for tol, cfg in configs.items():          # compile + warm
        outs[tol] = run(cfg)

    # quality vs the exact fixed point (tol=0)
    ref_out, ref_losses = outs[0.0]
    ref_logL = float(jnp.median(ref_out.last_loss))
    ref_flux = np.asarray(
        jnp.sum(ref_out.seds[0][0] * jnp.sum(ref_out.morphs[0][0],
                                             axis=(-2, -1))[:, None],
                axis=-1))
    quality = {}
    for tol, (out, losses) in outs.items():
        logL = float(jnp.median(out.last_loss))
        flux = np.asarray(
            jnp.sum(out.seds[0][0] * jnp.sum(out.morphs[0][0],
                                             axis=(-2, -1))[:, None],
                    axis=-1))
        dev = np.abs(flux - ref_flux) / np.maximum(np.abs(ref_flux), 1e-6)
        quality[tol] = {
            "final_logL": round(logL, 1),
            "flux_dev_median": round(float(np.median(dev)), 5),
            "flux_dev_max": round(float(np.max(dev)), 5),
            "iters": int(losses.shape[0]),
        }

    times = {tol: [] for tol in TOLS}
    for _ in range(reps):
        for tol, cfg in configs.items():
            t0 = time.perf_counter()
            run(cfg)
            times[tol].append(time.perf_counter() - t0)

    result = {}
    for tol in TOLS:
        med = sorted(times[tol])[reps // 2]
        result[str(tol)] = dict(
            quality[tol],
            blends_per_min=round(B / med * 60.0, 1),
            spread_s=[round(x, 3) for x in sorted(times[tol])],
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
