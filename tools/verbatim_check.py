"""Measure verbatim-line carryover between repo modules and the reference.

For each repo file, reports the share of its "long" code lines (normalized:
whitespace-stripped, >= 30 chars, non-comment) that appear verbatim anywhere
in the reference tree, plus the longest run of consecutive verbatim lines
and where it sits.  Used to verify the round-4 rewrite of transcribed host
code (VERDICT r3 copy findings: ops/interpolation.py, models/source.py,
initialization.py must drop below 25%).

Run: python tools/verbatim_check.py [files...]
"""
import sys
import glob
import os

REF = "/root/reference/scarlet"
DEFAULT = [
    "scarlet_tpu/ops/interpolation.py",
    "scarlet_tpu/models/source.py",
    "scarlet_tpu/initialization.py",
]


def norm(line):
    s = "".join(line.split())
    if s.startswith("#"):
        return ""
    return s


def ref_lines():
    lines = set()
    for path in glob.glob(os.path.join(REF, "**", "*.py"), recursive=True):
        with open(path, errors="replace") as f:
            for line in f:
                s = norm(line)
                if len(s) >= 30:
                    lines.add(s)
    return lines


def main():
    files = sys.argv[1:] or DEFAULT
    ref = ref_lines()
    for path in files:
        with open(path) as f:
            raw = f.readlines()
        long_idx = [i for i, line in enumerate(raw) if len(norm(line)) >= 30]
        hits = [i for i in long_idx if norm(raw[i]) in ref]
        hitset = set(hits)
        # longest run of consecutive long-line hits (ignoring short/blank
        # lines between them breaks the run only if a long miss intervenes)
        best, best_at, run, run_at = 0, -1, 0, -1
        for i in long_idx:
            if i in hitset:
                if run == 0:
                    run_at = i + 1
                run += 1
                if run > best:
                    best, best_at = run, run_at
            else:
                run = 0
        share = len(hits) / max(len(long_idx), 1)
        print(f"{path}: {len(hits)}/{len(long_idx)} long lines verbatim "
              f"({share:.0%}); longest run {best} starting line {best_at}")


if __name__ == "__main__":
    main()
