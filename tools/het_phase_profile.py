"""Where does the heterogeneous e2e stream spend its time?

The mono_tol=1e-3 default gains +17% on the raw fit but only +1.8% on the
het stream (BASELINE r4) — so the fit is a small share of het wall time.
This decomposes the bench's device-resident het configuration (256
generated blends, chunk=128, compact=50, retry_overflow=True) by
ablation, all timed as medians of ``reps``:

  full          the bench configuration
  no_retry      retry_overflow=False       -> retry-lane cost
  no_compact    compact=None               -> compaction net win/cost
  fit1          max_iter=1, compact=None   -> everything except the fit
  setup_only    stream_setup per chunk     -> the init program alone
  records_only  stream_records on a fitted batch -> measurement share

Run on TPU:  python tools/het_phase_profile.py [reps]
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
    return out, sorted(times)[len(times) // 2], times


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import stream as stream_mod
    from scarlet_tpu.parallel.batch import (fit_batch_device_dispatch,
                                            fit_batch_device_collect)

    import bench

    t00 = time.perf_counter()

    def t(msg):
        print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", file=sys.stderr,
              flush=True)

    het_images, het_var, het_psfs, het_centers, het_active = \
        bench.make_heterogeneous(bench.N_HET)
    model_psf = bench._model_psf()
    dev = [jax.device_put(x) for x in (het_images, het_var, het_psfs)]
    jax.block_until_ready(dev)
    t("inputs on device")

    common = dict(center_active=het_active, box_size=59,
                  n_slots=bench.HET_SLOTS, max_iter=bench.MAX_ITER,
                  check_every=25)
    N = bench.N_HET
    out = {"reps": reps, "n_blends": N}

    def run(**kw):
        return parallel.deblend_device_stream(
            dev[0], dev[1], dev[2], het_centers, model_psf, **common, **kw)

    for name, kw in (
            ("full", dict(chunk=128, compact=50, retry_overflow=True)),
            ("no_retry", dict(chunk=128, compact=50)),
            ("no_compact", dict(chunk=128, retry_overflow=True)),
            ("fit1", dict(chunk=128)),
    ):
        if name == "fit1":
            kw = dict(kw)
            saved = common["max_iter"]
            common["max_iter"] = 1
        _, med, times = timed(lambda kw=kw: run(**kw), reps)
        if name == "fit1":
            common["max_iter"] = saved
        out[name] = {"s": round(med, 3),
                     "blends_per_min": round(N / med * 60.0, 1),
                     "spread": [round(x, 3) for x in sorted(times)]}
        t(f"{name}: {out[name]}")

    # the init program alone (both chunks), and records alone
    def setup_only():
        res = []
        for sl in (slice(0, 128), slice(128, 256)):
            res.append(stream_mod.stream_setup(
                dev[0][sl], dev[1][sl], dev[2][sl], het_centers[sl],
                model_psf, center_active=het_active[sl], box_size=59,
                n_slots=bench.HET_SLOTS))
        return [r[2] for r in res]          # the states

    _, med, times = timed(setup_only, reps)
    out["setup_only"] = {"s": round(med, 3),
                         "spread": [round(x, 3) for x in sorted(times)]}
    t(f"setup_only: {out['setup_only']}")

    # records on a fitted batch (one chunk, re-measured)
    cfg, data, st, aux = stream_mod.stream_setup(
        dev[0][:128], dev[1][:128], dev[2][:128], het_centers[:128],
        model_psf, center_active=het_active[:128], box_size=59,
        n_slots=bench.HET_SLOTS)
    handle = fit_batch_device_dispatch(st, data, cfg, 50, check_every=25)
    fitted, losses = fit_batch_device_collect(handle, 50)
    jax.block_until_ready(jax.tree.leaves(fitted))

    def records_only():
        return stream_mod.stream_records(fitted, losses, aux, data=data,
                                         config=cfg)

    _, med, times = timed(records_only, reps)
    out["records_only_128"] = {"s": round(med, 3),
                               "spread": [round(x, 3) for x in sorted(times)]}
    t(f"records_only_128: {out['records_only_128']}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
