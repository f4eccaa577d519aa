"""Upload-strategy A/B for the UNPOISONED first stream call.

The in-process A/B (tools/upload_mode_ab.py) warms both routes before
timing, and warmup runs fetch records — in degraded-download windows one
device fetch drops the process's subsequent uploads ~20x (BASELINE r5
transfer-path mechanism study), so every timed arm there runs on a
poisoned link no matter the weather.  Production's first call of a
process (the common batch-job shape: one process, one stream) never
pays that: its bulk upload rides the fresh link.  This tool measures
THAT regime: each timed run is the FIRST stream call of a fresh
subprocess, programs loaded from the persistent compile cache, modes
interleaved bulk/overlap/resident across processes ("resident" =
device-resident inputs, the zero-upload control that prices the shared
first-call costs: trace + compiled-program load + records fetch).

The child prints the fixed full-size-warmup probe
(stream._upload_bandwidth_mbs) before its single run, so each sample is
labeled with the link regime it actually saw.

Usage: python tools/upload_first_call_ab.py [--reps 3] [--n 256]
"""
import argparse
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

CHILD = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/scarlet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
mode, n, chunk = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from bench import make_heterogeneous, _model_psf, HET_SLOTS, MAX_ITER
from scarlet_tpu import parallel
from scarlet_tpu.parallel import stream as sm
images, var, psfs, centers, active = make_heterogeneous(n)
mp = _model_psf()
bw = sm._upload_bandwidth_mbs()
kwargs = {}
if mode == "resident":
    images = jax.device_put(images)
    var = jax.device_put(var)
    images.block_until_ready(); var.block_until_ready()
else:
    kwargs["upload"] = mode
t0 = time.perf_counter()
recs, *_ = parallel.deblend_device_stream(
    images, var, psfs, centers, mp, center_active=active, box_size=59,
    n_slots=HET_SLOTS, max_iter=MAX_ITER, check_every=25, chunk=chunk,
    compact=50, retry_overflow=True, **kwargs)
wall = time.perf_counter() - t0
print(json.dumps({"mode": mode, "bw_mbs": round(bw, 1),
                  "wall_s": round(wall, 3)}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    modes = ("bulk", "overlap", "resident")
    samples = {m: [] for m in modes}
    bws = {m: [] for m in modes}
    for rep in range(args.reps):
        for mode in modes:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, mode, str(args.n),
                 str(args.chunk)],
                capture_output=True, text=True, timeout=3600)
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"rep {rep} {mode}: child failed\n{r.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            rec = json.loads(line[-1])
            samples[mode].append(rec["wall_s"])
            bws[mode].append(rec["bw_mbs"])
            print(f"rep {rep} {mode}: {rec['wall_s']:.3f} s "
                  f"(probe {rec['bw_mbs']} MB/s)", flush=True)

    med = {m: float(np.median(t)) if t else float("nan")
           for m, t in samples.items()}
    out = {
        "metric": "upload_first_call_ab",
        "n_blends": args.n,
        "chunk": args.chunk,
        "walls_s": samples,
        "probe_bw_mbs": bws,
        "medians_s": {m: round(med[m], 3) for m in modes},
        "upload_cost_s": {m: round(med[m] - med["resident"], 3)
                          for m in ("bulk", "overlap")},
        "bulk_speedup_first_call": round(med["overlap"] / med["bulk"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
