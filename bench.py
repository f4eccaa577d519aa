"""Benchmark: batched HSC 5-band deblending throughput on one chip.

Loads the bundled real HSC blend (hsc_cosmos_35), initializes sources the
standard way, replicates the blend into a large batch, and runs the fully
compiled 100-iteration adaprox fit (the reference's regression-harness
setting, scarlet/testing/settings.py:1-2) over the batch.

Prints ONE JSON line:
  {"metric": ..., "value": blends/min, "unit": ..., "vs_baseline": ...}
vs_baseline is measured against the BASELINE.json north star of 1000 HSC
5-band blends/min on a single chip (the reference publishes no absolute CPU
numbers — BASELINE.md).
"""
import json
import time

import numpy as np


def build_blend():
    import scarlet_tpu  # noqa: F401
    from scarlet_tpu import lite

    data = np.load("/root/reference/data/hsc_cosmos_35.npz", allow_pickle=True)
    images = data["images"].astype(np.float32)
    variance = data["variance"].astype(np.float32)
    psfs = data["psfs"].astype(np.float32)
    catalog = data["catalog"]

    # canonical quickstart weighting (docs/0-quickstart.ipynb): 1/variance,
    # no bitmask application
    weights = (1.0 / np.maximum(variance, 1e-12)).astype(np.float32)
    model_psf = lite.integrated_circular_gaussian(sigma=0.8)[None].astype(
        np.float32)
    obs = lite.LiteObservation(images, variance, weights, psfs,
                               model_psf=model_psf)
    centers = [(int(np.round(row["y"])), int(np.round(row["x"])))
               for row in catalog]
    sources = lite.init_all_sources_main(obs, centers, min_snr=50)
    sources = lite.parameterize_sources(sources, obs,
                                        lite.init_adaprox_component)
    return lite.LiteBlend(sources, obs)


def main():
    import jax
    from scarlet_tpu import parallel

    max_iter = 100
    batch = 512

    # initialization is host-side work: pin it to CPU so the many small,
    # uniquely-shaped setup ops don't pay accelerator dispatch latency
    with jax.default_device(jax.devices("cpu")[0]):
        blend = build_blend()
        config, data, state = blend.engine_setup(e_rel=1e-4)
    bdata, bstate = parallel.replicate_blend(data, state, batch)

    import jax.numpy as jnp

    def run():
        # converged early-exit in 10-iteration compiled segments (the
        # reference's e_rel stop, batched); value fetches synchronize — on
        # the axon tunnel backend block_until_ready returns early
        out_state, losses = parallel.fit_batch_converged(
            bstate, bdata, config, max_iter, segment=10)
        sync = float(jnp.sum(out_state.last_loss))
        return out_state, losses, sync

    # warmup: compile + one full run
    out_state, losses, _ = run()

    t0 = time.perf_counter()
    out_state, losses, _ = run()
    elapsed = time.perf_counter() - t0

    blends_per_min = batch / elapsed * 60.0
    try:
        final_logL = float(jnp.median(losses[-1]))
    except Exception:
        final_logL = float("nan")

    n_ran = int(losses.shape[0])
    result = {
        "metric": "HSC 5-band blends deblended/min (adaprox fit to "
                  f"e_rel=1e-4, cap {max_iter}, ran {n_ran} iters, "
                  f"batch={batch}, final_logL={final_logL:.1f})",
        "value": round(blends_per_min, 1),
        "unit": "blends/min",
        "vs_baseline": round(blends_per_min / 1000.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
