"""A/B the ITERATION-SCHEDULED mono tolerance (LiteFitConfig.mono_tol_early
/ mono_tol_switch) against the flat defaults.

Context (BASELINE r4): flat mono_tol=1e-3 is the accelerator default
(+17% steady, records bitwise identical); flat 1e-2 is +36% on the
replicated fit but UNSAFE on heterogeneous blends (19/256 lose >0.1%
logL).  The scheduled variant runs the kernel at a looser tolerance for
the first `switch` iterations and at the safe tolerance afterwards —
one compiled program (the tolerance is a traced SMEM scalar), with
convergence freezing suppressed until the switch.  Hypothesis: the
final tight-tolerance iterations restore the fixed-point quality that
flat 1e-2 loses, capturing part of its speed safely.

Section 1: replicated hsc_cosmos_35 fit (throughput + logL + flux dev
vs the exact kernel).  Section 2: 256 heterogeneous blends through the
production stream (per-blend logL deltas + flux dev p99 + throughput).
Round-robin interleaved, medians of `reps` (BASELINE r3 finding 5
methodology).

Run on the TPU:  python tools/mono_sched_bench.py [reps]
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B = 128
N = 256
SLOTS = 16
MAX_ITER = 100

# (mono_tol, mono_tol_early, mono_tol_switch); flat = switch 0
VARIANTS = {
    "exact": (0.0, 0.0, 0),
    "flat_1e-3": (1e-3, 0.0, 0),
    "flat_1e-2": (1e-2, 0.0, 0),
    "sched_50": (1e-3, 1e-2, 50),
    "sched_75": (1e-3, 1e-2, 75),
}


def steady_section(jax, jnp, reps):
    import bench
    from scarlet_tpu import parallel

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
        name: dataclasses.replace(config0, mono_tol=tol,
                                  mono_tol_early=early,
                                  mono_tol_switch=switch)
        for name, (tol, early, switch) in VARIANTS.items()}

    def run(cfg):
        out, losses = parallel.fit_batch_device_converged(
            bstate, bdata, cfg, MAX_ITER, check_every=25)
        jax.block_until_ready(out.last_loss)
        return out, losses

    outs = {name: run(cfg) for name, cfg in configs.items()}  # warm

    def fluxes(out):
        return np.asarray(
            jnp.sum(out.seds[0][0] * jnp.sum(out.morphs[0][0],
                                             axis=(-2, -1))[:, None],
                    axis=-1))

    ref_flux = fluxes(outs["exact"][0])
    times = {name: [] for name in VARIANTS}
    for _ in range(reps):
        for name, cfg in configs.items():
            t0 = time.perf_counter()
            run(cfg)
            times[name].append(time.perf_counter() - t0)

    result = {}
    for name, (out, losses) in outs.items():
        dev = np.abs(fluxes(out) - ref_flux) / np.maximum(
            np.abs(ref_flux), 1e-6)
        med = sorted(times[name])[reps // 2]
        result[name] = {
            "blends_per_min": round(B / med * 60.0, 1),
            "spread_s": [round(x, 3) for x in sorted(times[name])],
            "final_logL": round(float(jnp.median(out.last_loss)), 1),
            "flux_dev_median": round(float(np.median(dev)), 6),
            "flux_dev_max": round(float(np.max(dev)), 6),
            "iters": int(losses.shape[0]),
        }
    return result


def het_section(jax, reps):
    import bench
    from scarlet_tpu import parallel

    images, variance, psfs, centers, active = bench.make_heterogeneous(N)
    model_psf = bench._model_psf()
    dev = jax.device_put((images, variance, psfs))
    jax.block_until_ready(dev)
    dimages, dvar, dpsfs = dev

    def run(name):
        tol, early, switch = VARIANTS[name]
        return parallel.deblend_device_stream(
            dimages, dvar, dpsfs, centers, model_psf,
            center_active=active, box_size=59, n_slots=SLOTS,
            max_iter=MAX_ITER, check_every=25, chunk=128, compact=50,
            retry_overflow=True, mono_tol=tol, mono_tol_early=early,
            mono_tol_switch=switch)

    outs = {name: run(name) for name in VARIANTS}   # compile + warm
    times = {name: [] for name in VARIANTS}
    for _ in range(reps):
        for name in VARIANTS:
            t0 = time.perf_counter()
            run(name)
            times[name].append(time.perf_counter() - t0)

    ref_recs = outs["exact"][0]
    ref_logL = np.asarray([r["logL"] for r in ref_recs])
    ref_flux = [np.asarray(r["flux"]) for r in ref_recs]
    result = {}
    for name in VARIANTS:
        recs = outs[name][0]
        logL = np.asarray([r["logL"] for r in recs])
        devs = []
        for rf, r in zip(ref_flux, recs):
            f = np.asarray(r["flux"])
            denom = np.maximum(np.abs(rf), 1e-3 * np.abs(rf).max())
            devs.append(np.abs(f - rf) / denom)
        devs = np.concatenate([d.ravel() for d in devs])
        dl = logL - ref_logL
        med = sorted(times[name])[reps // 2]
        result[name] = {
            "blends_per_min": round(N / med * 60.0, 1),
            "spread_s": [round(x, 3) for x in sorted(times[name])],
            "median_logL_delta": round(float(np.median(dl)), 3),
            "worst_logL_delta": round(float(dl.min()), 3),
            "n_logL_worse_0.1pct": int(np.sum(
                dl < -1e-3 * np.abs(ref_logL))),
            "flux_dev_median": round(float(np.median(devs)), 6),
            "flux_dev_p99": round(float(np.percentile(devs, 99)), 5),
            "flux_dev_max": round(float(devs.max()), 5),
        }
    return result


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print(json.dumps({"steady": steady_section(jax, jnp, reps)}))
    print(json.dumps({"het": het_section(jax, reps)}))


if __name__ == "__main__":
    main()
