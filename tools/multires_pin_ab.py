"""A/B the r5 multires precision pin's THROUGHPUT cost on the chip.

The pin (models/resolution.py einsums at precision="float32") buys back
11 dB of on-chip render fidelity (tools/multires_precision_probe.py) —
this tool prices it: tools/multires_bench.py run pinned (shipped) vs
with the pre-pin program (child process that strips the precision kwarg
from jnp.einsum before anything traces), interleaved.

Usage: python tools/multires_pin_ab.py [--reps 2] [--batch 64]
"""
import argparse
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
if sys.argv[1] == "nopin":
    _real = jnp.einsum
    def _patched(s, *ops, **kw):
        kw.pop("precision", None)
        return _real(s, *ops, **kw)
    jnp.einsum = _patched
sys.argv = ["multires_bench.py", sys.argv[2]]
import runpy
runpy.run_path("/root/repo/tools/multires_bench.py", run_name="__main__")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    walls = {"pinned": [], "nopin": []}
    rates = {"pinned": [], "nopin": []}
    for rep in range(args.reps):
        for arm in ("pinned", "nopin"):
            r = subprocess.run(
                [sys.executable, "-c", CHILD, arm, str(args.batch)],
                capture_output=True, text=True, timeout=3600)
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"rep {rep} {arm}: child failed\n{r.stderr[-1500:]}",
                      file=sys.stderr)
                continue
            rec = json.loads(line[-1])
            walls[arm].append(rec)
            rates[arm].append(rec["blends_per_min"])
            print(f"rep {rep} {arm}: {rec}", flush=True)

    med = {a: float(np.median(v)) if v else float("nan")
           for a, v in rates.items()}
    print(json.dumps({
        "metric": "multires_pin_ab",
        "batch": args.batch,
        "fits_per_min": {a: rates[a] for a in rates},
        "medians": med,
        "pin_cost": round(med["nopin"] / med["pinned"], 3)
        if med["pinned"] == med["pinned"] else None,
    }))


if __name__ == "__main__":
    main()
