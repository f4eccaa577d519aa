"""Why do wavelet-recipe stream fits hit the iteration cap?

BASELINE r4: the wavelet-recipe stream runs 0.58x the main recipe,
mostly because its blends converge at median 100 iterations (= the cap)
vs 28 for the main recipe.  Two hypotheses:

  (a) genuine slow convergence — the diffuse multi-scale models keep
      improving logL materially past 100 iterations (then the cap is a
      QUALITY knob and the cost is honest), or
  (b) criterion failure — logL plateaus long before the cap but
      |dL| < e_rel |L| never fires (oscillation / noise floor), in
      which case a better stop rule is a real perf lever.

This runs both recipes on the same generated heterogeneous blends to a
2x cap and reports, per recipe: the converged fraction vs iteration,
the relative logL gain in (cap, 2*cap], and the per-blend iteration
where the trailing relative improvement first stays below e_rel (the
oracle stop), vs the iteration the criterion actually fired.

Run on the TPU:  python tools/wavelet_convergence_probe.py [N]
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

CAP = 100
SLOTS = 16
E_REL = 1e-4


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from scarlet_tpu import parallel

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    images, variance, psfs, centers, active = bench.make_heterogeneous(N)
    model_psf = bench._model_psf()
    dev = jax.device_put((images, variance, psfs))
    jax.block_until_ready(dev)
    dimages, dvar, dpsfs = dev

    result = {}
    for recipe in ("main", "wavelets"):
        # no compaction/chunking: losses come back as one (n_iter, N)
        # trajectory per stream
        records, state, losses, aux = parallel.deblend_device_stream(
            dimages, dvar, dpsfs, centers, model_psf,
            center_active=active, box_size=59, n_slots=SLOTS,
            max_iter=2 * CAP, check_every=25, recipe=recipe)
        L = np.asarray(losses)                     # (iters, N)
        its = np.asarray(state.it)                 # fired iteration (or cap)
        n_run = L.shape[0]

        # frozen blends repeat their last loss; the trajectory is valid
        # row-wise.  relative improvement from CAP to the end:
        atcap = L[min(CAP, n_run) - 1]
        final = L[-1]
        gain = (final - atcap) / np.abs(final)     # logL increases
        # oracle stop: first iteration where EVERY later step improves
        # less than e_rel (trailing criterion, no oscillation rescue)
        dl = np.abs(np.diff(L, axis=0)) / np.abs(L[1:])
        below = dl < E_REL                         # (iters-1, N)
        ever_above_after = np.cumsum(~below[::-1], axis=0)[::-1] > 0
        oracle = np.full(N, n_run)
        for b in range(N):
            idx = np.where(~ever_above_after[:, b])[0]
            if idx.size:
                oracle[b] = idx[0] + 1
        result[recipe] = {
            "iters_run": int(n_run),
            "median_fired_it": float(np.median(its)),
            "fired_by_cap_pct": round(
                100.0 * float(np.mean(its <= CAP)), 1),
            "median_oracle_it": float(np.median(oracle)),
            "oracle_by_cap_pct": round(
                100.0 * float(np.mean(oracle <= CAP)), 1),
            "rel_logL_gain_cap_to_2cap_median": float(np.median(gain)),
            "rel_gain_p90": float(np.percentile(gain, 90)),
            "blends_gaining_gt_erel_pct": round(
                100.0 * float(np.mean(gain > E_REL)), 1),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
