"""Minimal xplane trace parser: per-op DEVICE-time breakdown.

The installed tensorboard profiler plugin is ABI-broken here, but the TSL
protobuf bindings load fine; this aggregates XEvent durations by op name
on the TPU device planes — wall-clock-independent profiling (immune to
the axon tunnel's bandwidth weather).

Usage:
    python tools/parse_xplane.py <trace_dir_or_xplane.pb> [top_n]

Produce a trace with:
    with jax.profiler.trace("/tmp/prof"):
        ... run + block_until_ready ...
"""
import pathlib
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_xspace(path):
    p = pathlib.Path(path)
    if p.is_dir():
        cands = sorted(p.rglob("*.xplane.pb"),
                       key=lambda q: q.stat().st_mtime)
        if not cands:
            raise SystemExit(f"no .xplane.pb under {p}")
        p = cands[-1]
    space = xplane_pb2.XSpace()
    space.ParseFromString(p.read_bytes())
    return space, p


def device_op_totals(space, plane_filter=("TPU", "/device:")):
    """{op_name: (total_ps, count)} over matching planes."""
    totals = {}
    for plane in space.planes:
        if not any(tag in plane.name for tag in plane_filter):
            continue
        md = {m_id: m.name or m.display_name
              for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = md.get(ev.metadata_id, f"#{ev.metadata_id}")
                ps, n = totals.get(name, (0, 0))
                totals[name] = (ps + ev.duration_ps, n + 1)
    return totals


def main(argv):
    path = argv[1] if len(argv) > 1 else "/tmp/prof"
    top_n = int(argv[2]) if len(argv) > 2 else 25
    space, src = load_xspace(path)
    totals = device_op_totals(space)
    if not totals:
        planes = [p.name for p in space.planes]
        raise SystemExit(f"no TPU device planes in {src}; planes: {planes}")
    total_ms = sum(ps for ps, _ in totals.values()) / 1e9
    print(f"# {src}")
    print(f"# total device event time: {total_ms:.1f} ms")
    print(f"{'ms':>10}  {'%':>5}  {'count':>7}  op")
    for name, (ps, n) in sorted(totals.items(),
                                key=lambda kv: -kv[1][0])[:top_n]:
        ms = ps / 1e9
        print(f"{ms:10.2f}  {ms / total_ms * 100:5.1f}  {n:7d}  "
              f"{name[:90]}")


if __name__ == "__main__":
    main(sys.argv)
