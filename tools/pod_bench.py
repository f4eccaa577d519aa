"""Pod-slice readiness bench: the two production paths under multi-chip
sharding, one command, BASELINE-format output.

On real multi-chip hardware this measures (1) the steady-state batched
fit (`fit_batch_device_converged`) with the batch axis sharded over a
("blends", "bands") mesh at 128 x n_chips, and (2) the full device
stream (`stream_setup` -> fit -> `stream_records`) on blends-sharded raw
pixel stacks — per-chip chunks of 128.  Blends are independent, so ideal
scaling is linear; the printed per-chip efficiency is the number to
watch.

Smoke mode (no perf claim) validates the same code path on a virtual
CPU mesh:

    python tools/pod_bench.py --smoke            # 8 virtual CPU devices
    python tools/pod_bench.py                    # all attached chips
    python tools/pod_bench.py --devices 4        # first 4 chips

Prints ONE JSON line:
  {"metric": ..., "value": blends/min, "unit": "blends/min", ...}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None,
                    help="number of chips to use (default: all)")
    ap.add_argument("--smoke", action="store_true",
                    help="virtual 8-device CPU mesh (correctness only)")
    ap.add_argument("--per-chip", type=int, default=128,
                    help="blends per chip (128 = the single-chip optimum)")
    ap.add_argument("--max-iter", type=int, default=None,
                    help="iteration cap (default 100; smoke uses 4)")
    args = ap.parse_args()

    if args.smoke:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/scarlet_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    import bench
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import stream as stream_mod

    devices = jax.devices()
    n = args.devices or len(devices)
    per_chip = args.per_chip if not args.smoke else 4
    B = per_chip * n
    max_iter = args.max_iter or (4 if args.smoke else 100)
    check = min(25, max_iter)
    mesh = parallel.make_mesh(n)

    cpu = jax.devices("cpu")[0]
    d = bench.load_data()

    # ---- 1. steady-state fit, batch axis sharded over "blends" ----
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"],
                                  d["centers"])
        config, data, state = blend.engine_setup(
            e_rel=1e-4, platform=devices[0].platform)
    bdata, bstate = parallel.replicate_blend(data, state, B)
    sdata, sstate = parallel.shard_batch(bdata, bstate, mesh)

    def run_fit():
        with mesh:
            out, losses = parallel.fit_batch_device_converged(
                sstate, sdata, config, max_iter, check_every=check)
        jax.block_until_ready(out.last_loss)
        return out

    run_fit()                      # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_fit()
        ts.append(time.perf_counter() - t0)
    steady_s = sorted(ts)[1]
    steady_bpm = B / steady_s * 60.0
    final_logL = float(jnp.median(out.last_loss))
    del out, sdata, sstate, bdata, bstate

    # ---- 2. device stream on blends-sharded raw stacks ----
    variants = bench.make_variants(d, B)
    images = np.stack([v[0] for v in variants])
    variance = np.stack([v[1] for v in variants])
    psfs = np.stack([v[2] for v in variants])
    centers = np.stack([np.asarray(v[3]) for v in variants])
    model_psf = bench._model_psf()
    sh = NamedSharding(mesh, P("blends"))
    dev = [jax.device_put(x, sh) for x in (images, variance, psfs)]
    jax.block_until_ready(dev)

    def run_stream():
        with mesh:
            recs, *_ = parallel.deblend_device_stream(
                dev[0], dev[1], dev[2], centers, model_psf, box_size=59,
                n_slots=10, max_iter=max_iter, check_every=check,
                chunk=None)
        return recs

    run_stream()
    ts2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        recs = run_stream()
        ts2.append(time.perf_counter() - t0)
    stream_s = sorted(ts2)[1]
    stream_bpm = B / stream_s * 60.0

    # single-chip reference for the efficiency number (same program at
    # per_chip blends on device 0); skipped in smoke mode (CPU "chips"
    # share cores, the ratio means nothing there)
    eff = None
    if not args.smoke and n > 1:
        mesh1 = parallel.make_mesh(1)
        d1, s1 = parallel.shard_batch(
            *parallel.replicate_blend(data, state, per_chip), mesh1)

        def run1():
            with mesh1:
                o, _ = parallel.fit_batch_device_converged(
                    s1, d1, config, max_iter, check_every=check)
            jax.block_until_ready(o.last_loss)

        run1()
        t0 = time.perf_counter()
        run1()
        one_bpm = per_chip / (time.perf_counter() - t0) * 60.0
        eff = steady_bpm / (one_bpm * n)

    print(json.dumps({
        "metric": "HSC 5-band blends/min, batched fit sharded over "
                  f"{n} {devices[0].platform} device(s) "
                  f"(batch {per_chip}x{n}, cap {max_iter}, "
                  f"final_logL={final_logL:.1f})",
        "value": round(steady_bpm, 1),
        "unit": "blends/min",
        "spread_s": [round(x, 3) for x in sorted(ts)],
        "stream_blends_per_min": round(stream_bpm, 1),
        "stream_spread_s": [round(x, 3) for x in sorted(ts2)],
        "per_chip_efficiency": None if eff is None else round(eff, 3),
        "n_devices": n,
        "smoke": bool(args.smoke),
    }))


if __name__ == "__main__":
    main()
