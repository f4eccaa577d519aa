"""A/B the stream upload strategies (VERDICT r4 #7) on the real TPU.

Runs the bench het configuration (256 blends, chunk=128, n_slots=16,
compact=50, retry_overflow) from HOST-resident stacks under
upload="bulk" vs "overlap", interleaved round-robin so tunnel weather
hits both arms equally; also reports the measured idle bandwidth
(stream._upload_bandwidth_mbs) so BASELINE rows can say which regime the
window was in.  --throttle N sleeps N ms per chunk-upload... no: link
throttling is not synthesizable host-side without lying about overlap, so
degraded-window numbers come from re-running this tool when the tunnel is
actually slow (CLAUDE.md documents the 40x variance; the bandwidth figure
labels each run).

CAVEAT (BASELINE r5 transfer-path mechanism study): the warmup runs
fetch records, and in degraded-download windows one device fetch drops
the process's subsequent uploads ~20x for its lifetime — so this tool
times both arms download-POISONED regardless of upload weather.  That
is the right regime for long-lived multi-stream processes; for the
production batch-job shape (one process, one stream, upload precedes
the first fetch) use tools/upload_first_call_ab.py, which times fresh
subprocesses.

Usage: python tools/upload_mode_ab.py [--reps 3] [--n 256]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import make_heterogeneous, _model_psf, HET_SLOTS, MAX_ITER
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import stream as stream_mod

    images, var, psfs, centers, active = make_heterogeneous(args.n)
    model_psf = _model_psf()

    def run(mode):
        return parallel.deblend_device_stream(
            images, var, psfs, centers, model_psf, center_active=active,
            box_size=59, n_slots=HET_SLOTS, max_iter=MAX_ITER,
            check_every=25, chunk=args.chunk, compact=50,
            retry_overflow=True, upload=mode)

    # warm both programs (identical programs, but warm each route)
    run("bulk")
    run("overlap")

    bw0 = stream_mod._upload_bandwidth_mbs()
    times = {"bulk": [], "overlap": []}
    for _ in range(args.reps):
        for mode in ("bulk", "overlap"):
            t0 = time.perf_counter()
            recs, *_ = run(mode)
            times[mode].append(time.perf_counter() - t0)
    bw1 = stream_mod._upload_bandwidth_mbs()

    med = {m: float(np.median(t)) for m, t in times.items()}
    out = {
        "metric": "upload_mode_ab",
        "n_blends": args.n,
        "chunk": args.chunk,
        "idle_bw_mbs": [round(bw0, 1), round(bw1, 1)],
        "bulk_s": [round(t, 3) for t in times["bulk"]],
        "overlap_s": [round(t, 3) for t in times["overlap"]],
        "bulk_bpm": round(args.n / med["bulk"] * 60, 1),
        "overlap_bpm": round(args.n / med["overlap"] * 60, 1),
        "overlap_speedup": round(med["bulk"] / med["overlap"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
