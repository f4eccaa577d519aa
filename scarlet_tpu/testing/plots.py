"""Regression dashboards: per-metric distribution plots from the local
store.

Ref: scarlet/testing/measure.py:124-231 — the reference renders
violin/box plots of each metric per git branch into an AWS-hosted HTML
dashboard; here the same plots render locally with matplotlib (Agg) into
``<root>/dashboard/`` plus a self-contained index.html.
"""
from __future__ import annotations

import html
import pathlib

import numpy as np

from .measure import measurements
from .store import default_root, load_records

__all__ = ["metric_distributions", "render_dashboard"]


def metric_distributions(set_id, branches=None, root=None):
    """{metric: {branch: values}} across the latest run of each branch.

    Per-source metrics (the per-band magnitude errors) flatten over sources.
    """
    root = pathlib.Path(root) if root else default_root()
    if branches is None:
        branches = sorted(
            p.name for p in root.iterdir()
            if p.is_dir() and (p / f"set{set_id}.json").exists()
        ) if root.exists() else []

    out = {}
    for branch in branches:
        runs = load_records(set_id, branch=branch, root=root)
        if not runs:
            continue
        records = runs[-1]["records"]
        for name in measurements:
            vals = []
            for rec in records:
                if name in rec and np.isfinite(rec[name]):
                    vals.append(float(rec[name]))
                for src in rec.get("sources", []):
                    if name in src and np.isfinite(src[name]):
                        vals.append(float(src[name]))
            if vals:
                out.setdefault(name, {})[branch] = np.asarray(vals)
    return out


def render_dashboard(set_ids=(1, 2, 3, 4), branches=None, root=None,
                     out_dir=None):
    """Render violin/box distribution plots for every metric of every set
    and write an index.html; returns the list of written figure paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    root = pathlib.Path(root) if root else default_root()
    out_dir = pathlib.Path(out_dir) if out_dir else root / "dashboard"
    out_dir.mkdir(parents=True, exist_ok=True)

    written = []
    sections = []
    for set_id in set_ids:
        dists = metric_distributions(set_id, branches=branches, root=root)
        if not dists:
            continue
        names = [n for n in measurements if n in dists]
        ncol = 3
        nrow = (len(names) + ncol - 1) // ncol
        fig, axes = plt.subplots(nrow, ncol,
                                 figsize=(4.2 * ncol, 3.2 * nrow),
                                 squeeze=False)
        for ax in axes.flat[len(names):]:
            ax.axis("off")
        for ax, name in zip(axes.flat, names):
            per_branch = dists[name]
            labels = list(per_branch)
            data = [per_branch[b] for b in labels]
            if all(len(v) > 1 for v in data):
                parts = ax.violinplot(data, showmedians=True, widths=0.8)
                for pc in parts["bodies"]:
                    pc.set_alpha(0.5)
            else:
                for i, v in enumerate(data):
                    ax.plot(np.full(len(v), i + 1), v, "o", alpha=0.7)
            ax.set_xticks(np.arange(1, len(labels) + 1))
            ax.set_xticklabels(labels, rotation=20, fontsize=8)
            ax.set_title(f"{name}\n{measurements[name]}", fontsize=9)
            ax.grid(True, alpha=0.3)
        fig.suptitle(f"blend set {set_id}", fontsize=12)
        fig.tight_layout()
        path = out_dir / f"set{set_id}.png"
        fig.savefig(path, dpi=110)
        plt.close(fig)
        written.append(path)
        sections.append(
            f"<h2>Blend set {html.escape(str(set_id))}</h2>"
            f'<img src="set{set_id}.png" style="max-width:100%">'
        )

    index = out_dir / "index.html"
    index.write_text(
        "<html><head><title>scarlet_tpu regression dashboard</title></head>"
        "<body><h1>scarlet_tpu regression dashboard</h1>"
        + "".join(sections) + "</body></html>"
    )
    written.append(index)
    return written
