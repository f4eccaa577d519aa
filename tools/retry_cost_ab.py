"""The overflow retry lane costs 32% of het e2e wall time — is a bigger
slot layout cheaper than retrying?

tools/het_phase_profile.py measured the bench het config (256 blends,
n_slots=12, chunk=128, compact=50, retry_overflow=True) at 2.085 s, of
which the retry lane is 0.67 s (32%) — the retry refits the ~6% crowded
subset as a tiny padded batch at cap 100 with no compaction, and a
B=16 while-program pays nearly the same per-iteration wall as B=128
(latency floor, not compute).  r3 measured padding slots nearly free
(8 vs 12 slots: 1.05x), so candidate designs:

  A  n_slots=12 + retry            (current bench config, the baseline)
  B  n_slots=16 + retry            (overflow should become rare)
  C  n_slots=20, no retry          (structurally zero overflow: the het
                                    generator caps at 10 sources x 2
                                    components)
  D  retry subset alone, cap 100   (diagnose the 0.67 s)
  E  retry subset, compact=50      (does compacting the retry help?)

Run on TPU:  python tools/retry_cost_ab.py [reps]
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


def overflow_stats(records):
    eff = np.mean([bool(r.get("overflow")) and not r.get("overflow_retried")
                   for r in records])
    raw = np.mean([bool(r.get("overflow")) for r in records])
    return round(float(raw), 4), round(float(eff), 4)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scarlet_tpu import parallel

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

    N = bench.N_HET
    out = {"reps": reps, "n_blends": N}

    def run(n_slots, retry, imgs=None, var=None, psf=None, cen=None,
            act=None, **kw):
        return parallel.deblend_device_stream(
            dev[0] if imgs is None else imgs,
            dev[1] if var is None else var,
            dev[2] if psf is None else psf,
            het_centers if cen is None else cen, model_psf,
            center_active=het_active if act is None else act,
            box_size=59, n_slots=n_slots, max_iter=bench.MAX_ITER,
            check_every=25, retry_overflow=retry, **kw)

    for name, n_slots, retry in (("A_12_retry", 12, True),
                                 ("B_16_retry", 16, True),
                                 ("C_20_noretry", 20, False)):
        (records, _, _, _), med, times = timed(
            lambda n=n_slots, r=retry: run(n, r, chunk=128, compact=50),
            reps)
        raw, eff = overflow_stats(records)
        logl = round(sum(float(r["logL"]) for r in records), 1)
        out[name] = {"s": round(med, 3),
                     "blends_per_min": round(N / med * 60.0, 1),
                     "spread": [round(x, 3) for x in sorted(times)],
                     "overflow_rate": raw, "effective_overflow": eff,
                     "total_logL": logl}
        t(f"{name}: {out[name]}")

    # the retry subset in isolation (mirrors _retry_overflow's layout:
    # overflow idx padded to 16 rows, n_slots quantized up in steps of 4)
    _, _, _, aux = parallel.stream_setup(
        dev[0][:128], dev[1][:128], dev[2][:128], het_centers[:128],
        model_psf, center_active=het_active[:128], box_size=59, n_slots=12)
    _, _, _, aux2 = parallel.stream_setup(
        dev[0][128:], dev[1][128:], dev[2][128:], het_centers[128:],
        model_psf, center_active=het_active[128:], box_size=59, n_slots=12)
    overflow = np.concatenate([np.asarray(aux["overflow"]).reshape(-1),
                               np.asarray(aux2["overflow"]).reshape(-1)])
    n_active = np.concatenate([np.asarray(aux["n_active"]).reshape(-1),
                               np.asarray(aux2["n_active"]).reshape(-1)])
    idx = np.nonzero(overflow)[0]
    need = int(n_active[idx].max()) if idx.size else 12
    n_slots2 = 12 + -(-max(0, need - 12) // 4) * 4
    n_pad = -(-idx.size // 16) * 16 if idx.size else 0
    out["overflow_subset"] = {"n": int(idx.size), "need": need,
                              "n_slots2": n_slots2, "padded": n_pad}
    t(f"overflow subset: {out['overflow_subset']}")
    if idx.size:
        idx_pad = np.concatenate(
            [idx, np.full(n_pad - idx.size, idx[0], idx.dtype)])
        sc = het_centers[idx_pad]
        sa = het_active[idx_pad].copy()
        sa[idx.size:] = False
        sub = [x[idx_pad] for x in dev]
        for name, kw in (("D_retry_alone", {}),
                         ("E_retry_compact", {"compact": 50})):
            (records, _, _, _), med, times = timed(
                lambda kw=kw: run(n_slots2, False, imgs=sub[0], var=sub[1],
                                  psf=sub[2], cen=sc, act=sa, **kw), reps)
            its = [int(r["iterations"]) for r in records[:idx.size]]
            out[name] = {"s": round(med, 3),
                         "spread": [round(x, 3) for x in sorted(times)],
                         "iters_median": int(np.median(its)),
                         "iters_max": int(max(its))}
            t(f"{name}: {out[name]}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
