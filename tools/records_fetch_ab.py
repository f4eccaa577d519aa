"""A/B the fused stream-record fetch (one jax.device_get) against the
old per-array np.asarray fetches it replaced.

stream_records previously paid 8 synchronous device->host round trips
per chunk (~0.09 s/chunk = ~10% of het wall at n_slots=16, BASELINE r4);
device_get starts every copy before blocking so the tunnel RTTs overlap.
This measures records-only time both ways on a fitted 128-chunk, plus
the full bench het configuration for the end-to-end effect.

Run on TPU:  python tools/records_fetch_ab.py [reps]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, reps):
    import jax

    fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], sorted(times)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import stream as stream_mod
    from scarlet_tpu.parallel.batch import (fit_batch_device_dispatch,
                                            fit_batch_device_collect)

    import bench

    het_images, het_var, het_psfs, het_centers, het_active = \
        bench.make_heterogeneous(bench.N_HET)
    model_psf = bench._model_psf()
    dev = [jax.device_put(x) for x in (het_images, het_var, het_psfs)]
    jax.block_until_ready(dev)

    cfg, data, st, aux = stream_mod.stream_setup(
        dev[0][:128], dev[1][:128], dev[2][:128], het_centers[:128],
        model_psf, center_active=het_active[:128], box_size=59,
        n_slots=bench.HET_SLOTS)
    handle = fit_batch_device_dispatch(st, data, cfg, 50, check_every=25)
    fitted, losses = fit_batch_device_collect(handle, 50)
    jax.block_until_ready(jax.tree.leaves(fitted))

    out = {"reps": reps}

    def fused():
        return stream_mod.stream_records(fitted, losses, aux, data=data,
                                         config=cfg)

    def serial():
        # the pre-fix fetch pattern: one synchronous RTT per array
        per_source, centroids, moments2 = \
            stream_mod._stream_records_device(fitted, aux)
        per_source = np.asarray(per_source)
        centroids = np.asarray(centroids)
        moments2 = np.asarray(moments2)
        its = np.asarray(fitted.it)
        last = np.asarray(fitted.last_loss)
        n_act = np.asarray(fitted.comp_active[0]).sum(axis=1)
        snr = np.asarray(aux["snr"])
        overflowed = np.asarray(aux["overflow"]).reshape(-1)
        return np.asarray(losses), per_source, centroids, moments2, \
            its, last, n_act, snr, overflowed

    for name, fn in (("fused", fused), ("serial", serial)):
        med, times = timed(fn, reps)
        out[name] = {"s": round(med, 4),
                     "spread": [round(x, 4) for x in times]}

    # end-to-end bench het configuration
    def full():
        return parallel.deblend_device_stream(
            dev[0], dev[1], dev[2], het_centers, model_psf,
            center_active=het_active, box_size=59,
            n_slots=bench.HET_SLOTS, max_iter=bench.MAX_ITER,
            check_every=25, chunk=128, compact=50, retry_overflow=True)

    med, times = timed(lambda: jax.block_until_ready(
        jax.tree.leaves(full()[1])), max(3, reps // 2))
    out["full_het"] = {"s": round(med, 3),
                       "blends_per_min": round(bench.N_HET / med * 60.0, 1),
                       "spread": [round(x, 3) for x in times]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
