"""Probe: does fitting small blends with fewer slots pay? (padding waste)

The heterogeneous stream pads every blend to n_slots=12 component slots
while the mean occupancy is ~7.9 — and ~80% of iteration time (mono +
scene + grad + prox) is linear in the slot count.  Before building slot
grouping into the stream, measure the actual per-blend fit cost of the
SAME subset of blends (those with <= 8 active components) at n_slots=8
vs n_slots=12, device-resident, interleaved timing.

Also prints the component-count distribution to pick group boundaries.
Run: python tools/slot_group_probe.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import stream as stream_mod

    import bench

    het = bench.make_heterogeneous(256)
    images, variance, psfs, centers, active = het
    model_psf = bench._model_psf()

    d_images = jax.device_put(images)
    d_var = jax.device_put(variance)
    d_psfs = jax.device_put(psfs)
    jax.block_until_ready((d_images, d_var, d_psfs))

    # one full-slot setup to learn true component counts
    _, _, _, aux = stream_mod.stream_setup(
        d_images, d_var, d_psfs, centers, model_psf,
        center_active=active, box_size=59, n_slots=bench.HET_SLOTS)
    n_active = np.asarray(aux["n_active"])
    hist = {int(k): int(v) for k, v in
            zip(*np.unique(n_active, return_counts=True))}
    print(json.dumps({"n_active_hist": hist,
                      "mean": round(float(n_active.mean()), 2)}),
          flush=True)

    sel = np.nonzero(n_active <= 8)[0]
    # same blend count for both configs: trim to a multiple of 32
    sel = sel[: (len(sel) // 32) * 32]
    if not len(sel):
        raise SystemExit(
            "no eligible blends: fewer than 32 have <= 8 active "
            "components — nothing to probe on this stream")
    print(json.dumps({"subset": int(len(sel))}), flush=True)
    o = jnp.asarray(sel)
    im, va, ps = d_images[o], d_var[o], d_psfs[o]
    ce, ac = centers[sel], active[sel]

    def run(n_slots):
        return parallel.deblend_device_stream(
            im, va, ps, ce, model_psf, center_active=ac, box_size=59,
            n_slots=n_slots, max_iter=100, check_every=25,
            chunk=128, e_rel=1e-4, compact=50)

    for s in (12, 8):          # warm/compile
        run(s)
    times = {12: [], 8: []}
    logl = {}
    for _ in range(3):
        for s in (12, 8):
            t0 = time.perf_counter()
            recs, _, losses, _ = run(s)
            times[s].append(time.perf_counter() - t0)
            logl[s] = round(float(np.median(
                [r["logL"] for r in recs])), 2)
        print(json.dumps({f"slots{s}": round(sorted(v)[len(v) // 2], 3)
                          for s, v in times.items()}), flush=True)
    out = {}
    for s, v in times.items():
        med = sorted(v)[len(v) // 2]
        out[f"slots{s}_s"] = round(med, 3)
        out[f"slots{s}_spread"] = [round(x, 3) for x in sorted(v)]
        out[f"slots{s}_blends_per_min"] = round(len(sel) / med * 60, 1)
    out["speedup_8_vs_12"] = round(
        sorted(times[12])[1] / sorted(times[8])[1], 3)
    out["median_logl"] = logl
    print(json.dumps(out))


if __name__ == "__main__":
    main()
