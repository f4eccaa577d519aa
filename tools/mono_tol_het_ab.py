"""Quality A/B of the mono-kernel tolerance exit on HETEROGENEOUS blends.

tools/mono_tol_bench.py measured the replicated hsc_cosmos_35 fit at
tol=1e-3 with IDENTICAL final logL and per-source fluxes (+17%
throughput).  Before any default moves, this re-checks quality on 256
generated blends with different source counts/positions/sizes/seeing
(bench.make_heterogeneous) through the production stream: per-blend
logL deltas, per-source flux deviations, and throughput, device-resident
and round-robin interleaved.

Run on the TPU:  python tools/mono_tol_het_ab.py [reps]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

TOLS = (0.0, 1e-3, 1e-2)
N = 256
SLOTS = 12


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from scarlet_tpu import parallel

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    images, variance, psfs, centers, active = bench.make_heterogeneous(N)
    model_psf = bench._model_psf()
    dev = jax.device_put((images, variance, psfs))
    jax.block_until_ready(dev)
    dimages, dvar, dpsfs = dev

    def run(tol):
        return parallel.deblend_device_stream(
            dimages, dvar, dpsfs, centers, model_psf,
            center_active=active, box_size=59, n_slots=SLOTS,
            max_iter=100, check_every=25, chunk=128, compact=50,
            retry_overflow=True, mono_tol=tol)

    outs = {tol: run(tol) for tol in TOLS}     # compile + warm

    times = {tol: [] for tol in TOLS}
    for _ in range(reps):
        for tol in TOLS:
            t0 = time.perf_counter()
            run(tol)
            times[tol].append(time.perf_counter() - t0)

    ref_recs = outs[0.0][0]
    ref_logL = np.asarray([r["logL"] for r in ref_recs])
    ref_flux = [np.asarray(r["flux"]) for r in ref_recs]
    result = {}
    for tol in TOLS:
        recs = outs[tol][0]
        logL = np.asarray([r["logL"] for r in recs])
        # relative per-source flux deviation vs the exact kernel
        devs = []
        for rf, r in zip(ref_flux, recs):
            f = np.asarray(r["flux"])
            denom = np.maximum(np.abs(rf), 1e-3 * np.abs(rf).max())
            devs.append(np.abs(f - rf) / denom)
        devs = np.concatenate([d.ravel() for d in devs])
        dl = logL - ref_logL
        med = sorted(times[tol])[reps // 2]
        result[str(tol)] = {
            "blends_per_min": round(N / med * 60.0, 1),
            "spread_s": [round(x, 3) for x in sorted(times[tol])],
            "median_logL_delta": round(float(np.median(dl)), 3),
            "worst_logL_delta": round(float(dl.min()), 3),
            "best_logL_delta": round(float(dl.max()), 3),
            "n_logL_worse_0.1pct": int(np.sum(
                dl < -1e-3 * np.abs(ref_logL))),
            "flux_dev_median": round(float(np.median(devs)), 6),
            "flux_dev_p99": round(float(np.percentile(devs, 99)), 5),
            "flux_dev_max": round(float(devs.max()), 5),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
