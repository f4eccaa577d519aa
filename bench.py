"""Benchmark: batched HSC 5-band deblending throughput on one chip.

Three measurements at the reference's regression-harness setting (adaprox,
e_rel=1e-4, cap 100; scarlet/testing/settings.py:1-2):

1. steady-state: one initialized blend replicated into a batch, timed on
   the compiled fit alone (device throughput ceiling);
2. end-to-end: 256 *distinct* blends (dihedral transforms + fresh noise
   draws of the real hsc_cosmos_35), timed from raw pixel stacks through
   the device stream path (parallel.stream): one bulk async upload,
   batched on-device initialization, the batched fit, and per-source flux
   measurement — the production "stream of different blends" number that
   replaces the reference's serial per-blend loop (testing/api.py:216-226);
   also re-timed with device-side peak detection (centers=None) against
   the device-resident catalog run to expose the detection overhead;
3. end-to-end heterogeneous: 256 generated blends with different source
   counts (3-10), positions, sizes, and per-band seeing
   (testing/blendsets.py), through the same stream path; reports slot
   overflow and padding-waste rates alongside throughput.

End-to-end timings are the median of 3 repeats (spread reported).

Prints ONE JSON line:
  {"metric": ..., "value": blends/min, "unit": ..., "vs_baseline": ...,
   "end_to_end": {...}, "end_to_end_heterogeneous": {...}}
vs_baseline is measured against the BASELINE.json north star of 1000 HSC
5-band blends/min on a single chip (the reference publishes no absolute CPU
numbers — BASELINE.md).
"""
import json
import time


import numpy as np

MAX_ITER = 100
BATCH = 512
STEADY_BATCH = 128   # fastest per-blend batch (BASELINE.md r3 sweep)
N_E2E = 256
N_HET = 256
# Slot layout sized to ~p99 of needed components for the generated set
# (need max 15 here): overflow then never (or rarely) triggers the retry
# lane, which otherwise costs ~32% of het wall time refitting crowded
# blends as a tiny latency-bound batch.  Measured same-session at
# n_slots {12, 16, 20}: 6,817 / 9,099 / 6,742 blends/min — slots are
# cheap up to 16 but NOT beyond (tools/retry_cost_ab.py, BASELINE r4).
# retry_overflow stays on as the correctness backstop (free at 0%).
HET_SLOTS = 16


def load_data():
    data = np.load("/root/reference/data/hsc_cosmos_35.npz", allow_pickle=True)
    return {
        "images": data["images"].astype(np.float32),
        "variance": data["variance"].astype(np.float32),
        "psfs": data["psfs"].astype(np.float32),
        "centers": [(int(np.round(row["y"])), int(np.round(row["x"])))
                    for row in data["catalog"]],
    }


def _model_psf():
    from scarlet_tpu import lite

    return lite.integrated_circular_gaussian(sigma=0.8)[None].astype(
        np.float32)


def build_blend(images, variance, psfs, centers):
    from scarlet_tpu import lite

    weights = (1.0 / np.maximum(variance, 1e-12)).astype(np.float32)
    model_psf = _model_psf()
    obs = lite.LiteObservation(images, variance, weights, psfs,
                               model_psf=model_psf)
    sources = lite.init_all_sources_main(obs, centers, min_snr=50)
    sources = lite.parameterize_sources(sources, obs,
                                        lite.init_adaprox_component)
    return lite.LiteBlend(sources, obs)


def make_variants(d, n, seed=0):
    """n distinct realistic blends: the 4 shape-preserving dihedral
    transforms x fresh Gaussian noise re-draws x flux scalings."""
    rng = np.random.default_rng(seed)
    H, W = d["images"].shape[1:]
    out = []
    for i in range(n):
        k = i % 4
        flipy, flipx = k & 1, k & 2
        sl = (slice(None), slice(None, None, -1 if flipy else None),
              slice(None, None, -1 if flipx else None))
        images = np.ascontiguousarray(d["images"][sl])
        variance = np.ascontiguousarray(d["variance"][sl])
        psfs = np.ascontiguousarray(d["psfs"][sl])
        scale = np.float32(0.85 + 0.3 * rng.random())
        noise = (rng.standard_normal(images.shape).astype(np.float32)
                 * np.sqrt(variance) * np.float32(0.3))
        images = images * scale + noise
        variance = variance * scale ** 2
        centers = [
            (H - 1 - cy if flipy else cy, W - 1 - cx if flipx else cx)
            for cy, cx in d["centers"]
        ]
        out.append((images, variance, psfs, centers))
    return out


def make_heterogeneous(n, seed=42):
    """n generated blends with varying source counts/positions/sizes and
    per-band seeing (testing/blendsets.py), packed to one center layout."""
    from scarlet_tpu.testing.blendsets import generate_blend

    rng = np.random.default_rng(seed)
    blends = [generate_blend(rng) for _ in range(n)]
    images = np.stack([b["images"] for b in blends])
    variance = np.stack([np.ascontiguousarray(b["variance"])
                         for b in blends])
    psfs = np.stack([b["psfs"] for b in blends])
    K = max(len(b["catalog"]) for b in blends)
    centers = np.zeros((n, K, 2), np.int32)
    active = np.zeros((n, K), bool)
    for i, b in enumerate(blends):
        cat = b["catalog"]
        k = len(cat)
        centers[i, :k, 0] = np.round(cat["y"]).astype(np.int32)
        centers[i, :k, 1] = np.round(cat["x"]).astype(np.int32)
        active[i, :k] = True
    return images, variance, psfs, centers, active


def _stamp(t0, msg):
    import sys
    print(f"[bench {time.perf_counter()-t0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _median_timed(fn, n=3):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    return out, sorted(times)[n // 2], times


def main():
    import jax

    # compiled programs persist across bench invocations (the axon-tunnel
    # compile of the 10-iteration fit segment is the dominant one-time cost)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from scarlet_tpu import parallel

    t00 = time.perf_counter()

    cpu = jax.devices("cpu")[0]
    fit_platform = jax.devices()[0].platform   # where the batched fit runs
    d = load_data()

    # ---- steady-state: compiled fit over a replicated batch ----
    # initialization is host-side work: pin it to CPU so the many small,
    # uniquely-shaped setup ops don't pay accelerator dispatch latency
    with jax.default_device(cpu):
        blend = build_blend(d["images"], d["variance"], d["psfs"],
                            d["centers"])
        config, data, state = blend.engine_setup(e_rel=1e-4,
                                                 platform=fit_platform)
    if fit_platform != "cpu":
        import dataclasses

        # production mono tolerance (the stream default): +17% with final
        # records bitwise identical to the exact kernel — BASELINE r4
        config = dataclasses.replace(config, mono_tol=1e-3)
    bdata, bstate = parallel.replicate_blend(data, state, STEADY_BATCH)

    def run():
        # converged early-exit evaluated on device every 25 iterations
        # (the reference's e_rel stop, batched); value fetches synchronize
        out_state, losses = parallel.fit_batch_device_converged(
            bstate, bdata, config, MAX_ITER, check_every=25)
        sync = float(jnp.sum(out_state.last_loss))
        return out_state, losses, sync

    _stamp(t00, "single blend initialized")
    # warmup: compile + settle transfers (one short run)
    parallel.fit_batch_device_converged(bstate, bdata, config, 25,
                                        check_every=25)
    _stamp(t00, "steady-state fit compiled")
    out_state, losses, _ = run()
    _stamp(t00, "steady-state warm run done")
    steady_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out_state, losses, _ = run()
        steady_times.append(time.perf_counter() - t0)
    steady_s = sorted(steady_times)[1]
    steady_bpm = STEADY_BATCH / steady_s * 60.0
    _stamp(t00, "steady-state timed: "
           f"{[f'{t:.2f}' for t in sorted(steady_times)]}")
    try:
        final_logL = float(jnp.median(losses[-1]))
    except Exception:
        final_logL = float("nan")
    n_ran = int(losses.shape[0])
    # release the steady-state buffers before the end-to-end section
    # (HBM pressure there costs throughput)
    del out_state, losses, bdata, bstate

    # ---- end-to-end: distinct blends through the DEVICE stream path
    # (bulk upload + batched init + fit + measurement; no per-blend host
    # work — parallel.stream) ----
    variants = make_variants(d, N_E2E)
    e2e_images = np.stack([v[0] for v in variants])
    e2e_var = np.stack([v[1] for v in variants])
    e2e_psfs = np.stack([v[2] for v in variants])
    e2e_centers = np.stack([np.asarray(v[3]) for v in variants])
    model_psf = _model_psf()

    def run_e2e(inputs):
        # chunk=128 pipelines the init of each chunk behind the previous
        # chunk's fit; numpy inputs bulk-upload in one async transfer
        return parallel.deblend_device_stream(
            inputs[0], inputs[1], inputs[2], e2e_centers, model_psf,
            box_size=59, n_slots=10, max_iter=MAX_ITER, check_every=25,
            chunk=128)

    np_inputs = (e2e_images, e2e_var, e2e_psfs)
    run_e2e(np_inputs)   # warmup: compiles init + fit + records programs
    _stamp(t00, "end-to-end warmup done")

    (records, _, e2e_losses, _), e2e_s, e2e_times = _median_timed(
        lambda: run_e2e(np_inputs))
    e2e_bpm = N_E2E / e2e_s * 60.0
    _stamp(t00, f"end-to-end timed: {[f'{x:.2f}' for x in e2e_times]}")

    # tunnel diagnostics: the raw upload alone (idle device), and the same
    # path with device-resident inputs — the tunneled test setup's
    # host->device bandwidth swings ~40x between sessions (BASELINE.md),
    # which is environment, not pipeline; these two numbers separate it
    t0 = time.perf_counter()
    dev_inputs = jax.device_put(np_inputs)
    jax.block_until_ready(dev_inputs)
    upload_s = time.perf_counter() - t0
    _, e2e_dev_s, e2e_dev_times = _median_timed(
        lambda: run_e2e(dev_inputs))
    _stamp(t00, f"device-resident e2e: {[f'{x:.2f}' for x in e2e_dev_times]}")

    # detection path: centers=None replaces the explicit catalog with
    # device-side peak detection (parallel.detect_peaks_device) inside the
    # stream; device-resident inputs so the detection overhead is measured
    # against the same-session catalog number, not tunnel upload weather
    # (tools/detect_stream_bench.py methodology; BASELINE r4: 2.06%)
    def run_e2e_detect():
        return parallel.deblend_device_stream(
            dev_inputs[0], dev_inputs[1], dev_inputs[2], None, model_psf,
            box_size=59, n_slots=10, max_iter=MAX_ITER, check_every=25,
            chunk=128)

    run_e2e_detect()   # warmup: compiles the detection program
    _, e2e_det_s, e2e_det_times = _median_timed(run_e2e_detect)
    _stamp(t00, f"detection e2e: {[f'{x:.2f}' for x in e2e_det_times]}")

    e2e_result = {
        "blends_per_min": round(e2e_bpm, 1),
        "n_distinct_blends": N_E2E,
        "path": "device stream (bulk upload + batched init + fit + "
                "measure)",
        "median_of": len(e2e_times),
        "spread_s": [round(x, 3) for x in sorted(e2e_times)],
        "median_iterations": int(sorted(
            r["iterations"] for r in records)[N_E2E // 2]),
        "iters_ran": int(max(r["iterations"] for r in records)),
        "upload_s_idle": round(upload_s, 3),
        "device_resident_blends_per_min": round(
            N_E2E / e2e_dev_s * 60.0, 1),
        "device_resident_spread_s": [
            round(x, 3) for x in sorted(e2e_dev_times)],
        "detection_blends_per_min": round(N_E2E / e2e_det_s * 60.0, 1),
        "detection_spread_s": [round(x, 3) for x in sorted(e2e_det_times)],
        "detection_overhead_pct": round(
            100.0 * (e2e_det_s - e2e_dev_s) / e2e_dev_s, 2),
    }
    del records, e2e_losses, dev_inputs

    # ---- end-to-end heterogeneous: different K/positions/sizes/seeing --
    het = make_heterogeneous(N_HET)
    het_images, het_var, het_psfs, het_centers, het_active = het

    def run_het():
        # compact=50: convergence compaction — most generated blends
        # converge by ~30 iterations; only the stragglers (gathered into
        # one small residual batch) pay the cap tail (+23% measured).
        # retry_overflow: blends whose init wants more components than
        # n_slots re-fit at a larger slot count (no sources dropped)
        # upload="auto": one 4 MB probe picks bulk on a healthy tunnel
        # (interleaved transfers crawl during compute, BASELINE r3) or
        # per-chunk double-buffered overlap on a slow link (+13% measured
        # at 32-52 MB/s idle, BASELINE r5)
        return parallel.deblend_device_stream(
            het_images, het_var, het_psfs, het_centers, model_psf,
            center_active=het_active, box_size=59, n_slots=HET_SLOTS,
            max_iter=MAX_ITER, check_every=25, chunk=128, compact=50,
            retry_overflow=True, upload="auto")

    run_het()
    _stamp(t00, "heterogeneous warmup done")
    (hrecords, _, _, haux), het_s, het_times = _median_timed(run_het)
    het_bpm = N_HET / het_s * 60.0
    _stamp(t00, f"heterogeneous timed: {[f'{x:.2f}' for x in het_times]}")

    # device-resident variant: same programs, pixel stacks already on the
    # chip — separates device throughput from tunnel upload weather
    het_dev = [jax.device_put(x) for x in (het_images, het_var, het_psfs)]
    jax.block_until_ready(het_dev)

    def run_het_dev():
        return parallel.deblend_device_stream(
            het_dev[0], het_dev[1], het_dev[2], het_centers, model_psf,
            center_active=het_active, box_size=59, n_slots=HET_SLOTS,
            max_iter=MAX_ITER, check_every=25, chunk=128, compact=50,
            retry_overflow=True)

    _, het_dev_s, het_dev_times = _median_timed(run_het_dev)
    _stamp(t00, "heterogeneous device-resident: "
           f"{[f'{x:.2f}' for x in het_dev_times]}")
    del het_dev

    aux_list = haux if isinstance(haux, list) else [haux]
    # the overflow-retry pass appends one aux entry indexed by
    # retry_indices (with padding rows); the stream-order stats come from
    # the main-pass entries only
    main_aux = [a for a in aux_list if "retry_indices" not in a]
    n_active = np.concatenate([np.asarray(a["n_active"]) for a in main_aux])
    overflow = np.concatenate([np.asarray(a["overflow"]) for a in main_aux])
    n_active = n_active.reshape(-1)
    overflow = overflow.reshape(-1)
    # effective = sources actually dropped after the retry lane
    eff_overflow = float(np.mean([bool(r.get("overflow"))
                                  and not r.get("overflow_retried")
                                  for r in hrecords]))
    het_result = {
        "blends_per_min": round(het_bpm, 1),
        "n_distinct_blends": N_HET,
        "n_slots": HET_SLOTS,
        "median_of": len(het_times),
        "spread_s": [round(x, 3) for x in sorted(het_times)],
        "mean_components": round(float(n_active.mean()), 2),
        "slot_overflow_rate": round(float(overflow.mean()), 4),
        "effective_overflow_rate": round(eff_overflow, 4),
        "padding_waste": round(
            1.0 - float(np.minimum(n_active, HET_SLOTS).mean()) / HET_SLOTS,
            4),
        "median_iterations": int(sorted(
            r["iterations"] for r in hrecords)[N_HET // 2]),
        "device_resident_blends_per_min": round(
            N_HET / het_dev_s * 60.0, 1),
        "device_resident_spread_s": [
            round(x, 3) for x in sorted(het_dev_times)],
    }

    result = {
        "metric": "HSC 5-band blends deblended/min (adaprox fit to "
                  f"e_rel=1e-4, cap {MAX_ITER}, ran {n_ran} iters, "
                  f"batch={STEADY_BATCH}, final_logL={final_logL:.1f})",
        "value": round(steady_bpm, 1),
        "unit": "blends/min",
        "vs_baseline": round(steady_bpm / 1000.0, 3),
        "steady_spread_s": [round(x, 3) for x in sorted(steady_times)],
        "end_to_end": e2e_result,
        "end_to_end_heterogeneous": het_result,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
