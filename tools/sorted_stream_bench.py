"""Does difficulty-sorting the stream pay off? (ROADMAP r3 #4)

Convergence early exit in the chunked stream is all-or-nothing per
chunk: one straggler forces its whole chunk to the next compaction
point (or the cap).  If blends are SORTED by predicted iteration count
before chunking, easy chunks exit at the first check boundary and only
the hard chunk pays the tail — compaction then collects a smaller
residual.

This measures, on the same 256-blend heterogeneous stream as bench.py:
  1. the iteration-count predictors actually available BEFORE the fit
     (component count, total detection flux) vs the true iteration
     counts from one run — Spearman rank correlation;
  2. wall-clock for unsorted vs predictor-sorted vs oracle-sorted
     (sorted by the true iteration counts — the upper bound), each
     with the shipping compact=50 and chunk=128.

Run: python tools/sorted_stream_bench.py [chunk ...]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def _avg_ranks(a):
    """Average ranks for ties (scipy.stats.rankdata(method="average"))."""
    a = np.asarray(a)
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), np.float64)
    i = 0
    while i < len(a):
        j = i
        while j + 1 < len(a) and a[order[j + 1]] == a[order[i]]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j)
        i = j + 1
    return ranks


def spearman(a, b):
    ra = _avg_ranks(a)
    rb = _avg_ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() /
                 np.sqrt((ra * ra).sum() * (rb * rb).sum()))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from scarlet_tpu import parallel

    import bench

    chunks = [int(c) for c in sys.argv[1:]] or [128]
    het = bench.make_heterogeneous(256)
    images, variance, psfs, centers, active = het
    model_psf = bench._model_psf()
    import jax.numpy as jnp

    # device-resident inputs: remove the 38 MB per-run upload so tunnel
    # bandwidth weather can't masquerade as a sorting effect
    d_images = jax.device_put(images)
    d_var = jax.device_put(variance)
    d_psfs = jax.device_put(psfs)
    jax.block_until_ready((d_images, d_var, d_psfs))

    def run(order=None, chunk=128, compact=50):
        if order is None:
            im, va, ps = d_images, d_var, d_psfs
            ce, ac = centers, active
        else:
            o = jnp.asarray(order)
            im, va, ps = d_images[o], d_var[o], d_psfs[o]
            on = np.asarray(order)
            ce, ac = centers[on], active[on]
        return parallel.deblend_device_stream(
            im, va, ps, ce, model_psf,
            center_active=ac, box_size=59,
            n_slots=bench.HET_SLOTS, max_iter=100, check_every=25,
            chunk=chunk, e_rel=1e-4, compact=compact)

    # --- one run for the true iteration counts + predictors -----------
    recs, _, _, _ = run()
    iters = np.array([r["iterations"] for r in recs])
    n_comp = active.sum(axis=1)
    flux = np.abs(np.asarray(images)).sum(axis=(1, 2, 3))
    print(json.dumps({
        "spearman_iter_vs_ncomp": round(spearman(iters, n_comp), 3),
        "spearman_iter_vs_flux": round(spearman(iters, flux), 3),
        "iters_quartiles": [int(q) for q in
                            np.percentile(iters, [0, 25, 50, 75, 100])],
    }), flush=True)

    variants = {}
    orders = {
        "oracle": np.argsort(iters, kind="stable"),
        "ncomp": np.argsort(n_comp, kind="stable"),
    }
    for chunk in chunks:
        # unsorted baseline at the SAME chunk size as the sorted variants
        variants[f"unsorted_c{chunk}"] = dict(chunk=chunk)
        for name, order in orders.items():
            variants[f"{name}_c{chunk}"] = dict(order=order, chunk=chunk)
            if name == "oracle":
                # sorted chunks early-exit on their own: is compaction
                # still needed at all?
                variants[f"{name}_c{chunk}_nocompact"] = dict(
                    order=order, chunk=chunk, compact=None)

    # warm every variant (compiles), then interleave timed rounds so slow
    # tunnel drift hits all variants equally
    for kw in variants.values():
        run(**kw)
    times = {k: [] for k in variants}
    for _ in range(3):
        for k, kw in variants.items():
            t0 = time.perf_counter()
            run(**kw)
            times[k].append(time.perf_counter() - t0)
        print(json.dumps({k: round(sorted(v)[len(v) // 2], 3)
                          for k, v in times.items()}), flush=True)

    results = {}
    for k, v in times.items():
        med = sorted(v)[len(v) // 2]
        results[k + "_s"] = round(med, 3)
        results[k + "_spread"] = [round(x, 3) for x in sorted(v)]
        results[k + "_blends_per_min"] = round(256 / med * 60, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
