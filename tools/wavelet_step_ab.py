"""Wavelet-recipe convergence A/B: morphology step scaling (VERDICT r4 #5).

The wavelet-recipe stream converges at median 100 iterations (= the cap)
vs 28 for the main recipe, and the convergence probe ruled out a
stop-rule failure (BASELINE r4): the diffuse starlet-initialized models
genuinely move slowly under adaprox at the engine's morph_step=1e-2.
A/B larger morphology steps on the SAME het wavelet stream at a 2x cap:
median iterations to convergence and final logL (quality guard — a step
that converges "faster" to a worse logL is a loss, not a win).

Run: python tools/wavelet_step_ab.py [N] [--cpu]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CAP = 200
STEPS = [0.01, 0.015, 0.02, 0.03]


def main():
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    n = int(args[0]) if args else 128
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from scarlet_tpu import parallel

    images, var, psfs, centers, active = bench.make_heterogeneous(n)
    model_psf = bench._model_psf()
    dev = [jax.device_put(x) for x in (images, var, psfs)]
    jax.block_until_ready(dev)

    out = {"metric": "wavelet_step_ab", "n": n, "cap": CAP}
    for step in STEPS:
        t0 = time.perf_counter()
        recs, _, _, _ = parallel.deblend_device_stream(
            dev[0], dev[1], dev[2], centers, model_psf,
            center_active=active, box_size=59, n_slots=16,
            max_iter=CAP, check_every=25, e_rel=1e-4,
            recipe="wavelets", morph_step=step)
        wall = time.perf_counter() - t0
        its = np.asarray([r["iterations"] for r in recs])
        logl = np.asarray([r["logL"] for r in recs])
        out[f"step_{step}"] = {
            "median_iters": int(np.median(its)),
            "capped_frac": round(float(np.mean(its >= CAP)), 3),
            "median_logL": round(float(np.median(logl)), 2),
            "worst_logL_delta_vs_base": None,   # filled below
            "wall_s": round(wall, 2),
        }
        if step == STEPS[0]:
            base_logl = logl
        else:
            d = logl - base_logl
            out[f"step_{step}"]["worst_logL_delta_vs_base"] = round(
                float(np.min(d)), 2)
            out[f"step_{step}"]["median_logL_delta_vs_base"] = round(
                float(np.median(d)), 2)
        print(json.dumps({f"step={step}": out[f"step_{step}"]}),
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
