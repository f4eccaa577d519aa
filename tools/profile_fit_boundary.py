"""Profile the packed 128-blend fit while-program: per-op device-time
table, aimed at the while-boundary staging question (r3 closing profile:
~1.4 ms/iter (26%) of slice-starts moving packed windows in/out of the
loop carries).

Usage:  python tools/profile_fit_boundary.py [batch] [n_iter] [chain]
        ("chain" as the 3rd arg profiles packed_prox_chain=True)

Prints the parse_xplane per-op table plus a boundary-vs-compute summary.
Trace dir: /tmp/prof_fit_boundary (overwritten).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from scarlet_tpu import parallel

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N_ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    cpu = jax.devices("cpu")[0]
    d = bench.load_data()
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"],
                                  d["centers"])
        config, data, state = blend.engine_setup(
            e_rel=1e-4, platform=jax.devices()[0].platform)
    bdata, bstate = parallel.replicate_blend(data, state, B)
    # materialize the broadcast-view state (timing hazard, BASELINE r3
    # finding 9)
    bstate = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(np.asarray(x)),
        bstate, is_leaf=lambda x: x is None)
    bdata = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(np.asarray(x)),
        bdata, is_leaf=lambda x: x is None)
    if "chain" in sys.argv[3:]:
        import dataclasses
        config = dataclasses.replace(config, packed_prox_chain=True)
    if "tol" in sys.argv[3:]:
        # production accelerator default (mono_tol=1e-3): where does the
        # iteration go once the mono kernel exits early?
        import dataclasses
        config = dataclasses.replace(config, mono_tol=1e-3)

    def run():
        out, losses = parallel.fit_batch_device_converged(
            bstate, bdata, config, N_ITER, check_every=25)
        jax.block_until_ready(out)
        return out

    run()  # compile + warm
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    print(f"warm run: {wall:.3f}s -> {B / wall * 60:.0f} blends/min",
          file=sys.stderr)

    with jax.profiler.trace("/tmp/prof_fit_boundary"):
        run()

    from parse_xplane import load_xspace, device_op_totals

    space, path = load_xspace("/tmp/prof_fit_boundary")
    totals = device_op_totals(space)
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
    total_ps = sum(ps for ps, _ in totals.values())
    print(f"# trace {path}")
    print(f"{'op':70s} {'ms':>9s} {'count':>7s} {'share':>6s}")
    boundary_ms = 0.0
    for name, (ps, n) in rows[:40]:
        ms = ps / 1e9
        share = ps / total_ps
        print(f"{name[:70]:70s} {ms:9.2f} {n:7d} {share:6.1%}")
        low = name.lower()
        if ("slice" in low or "copy" in low or "transpose" in low) \
                and "fusion" not in low:
            boundary_ms += ms
    print(f"\nslice/copy/transpose total: {boundary_ms:.2f} ms "
          f"({boundary_ms / (total_ps / 1e9):.1%} of device time)")


if __name__ == "__main__":
    main()
