"""Attribute the mono kernel's 0.439 us/pass to instruction classes.

The r5 roofline (BASELINE.md, tools/roofline_mono.py) bounds the packed
monotonicity kernel at 35-51% of the nominal v5e VPU ALU peak and blames
the remaining <~2x on Mosaic instruction scheduling.  This tool makes the
attribution quantitative: it times MICROKERNEL VARIANTS of the production
pass at forced pass counts (dynamic-tol exit that never fires, exactly
like roofline_mono.py) and fits a per-pass slope for each:

  full       the production pass verbatim (17 arith ops + 4 rolls)
  noreduce   production pass, but the every-UNROLL convergence reduce is
             replaced by a loop-counter-only exit  -> reduce+carry cost
  unroll8    production pass at UNROLL=8            -> reduce amortization
  norolls    production arithmetic with the 4 rolls replaced by identity
             (17 arith ops, 0 rolls)                -> roll cost by delta
  rollsonly  4 rolls + 3 adds + 1 mul, no stencil   -> roll cost direct
  alu8       8 chained multiply-adds (16 arith ops, FMA-pairable)
             -> the achievable ALU rate for exactly FMA-shaped code
  bf16       the ROLL-FREE stencil computed in bfloat16 (x, w in bf16)
             -> does halving element width double VPU throughput? compare
             against norolls.  (Roll-free because Mosaic cannot rotate
             non-32-bit data — "not implemented: Rotate with non-32-bit
             data", measured 2026-08-20 — which by itself rules out a
             bf16 production mono kernel.)

Each variant's slope divides into the op accounting to give "us per
vector-op over the padded (64, 640) tile" — if rolls cost multiples of an
ALU op, the gap is roll-bound; if alu8's rate matches `full`'s arithmetic
rate, Mosaic is already FMA-fusing and the gap is real scheduling floor.

Usage: python tools/mono_pass_attrib.py [--cpu] [--reps 9]
One JSON line to stdout; numbers land in BASELINE.md.

Reference semantics anchored to scarlet/operators_pybind11.cc:14-36 (the
weighted monotonic sweep this kernel reproduces); variants here are
measurement scaffolding only, never a production path.
"""
import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="CPU interpret-mode smoke run (checks harness + "
                         "variant correctness, timings meaningless)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--variants", nargs="*", default=None)
    args = ap.parse_args()

    import jax

    # persistent compile cache: variant kernels recompile across
    # reruns otherwise (tunnel compiles dominate tool wall time)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from scarlet_tpu.lite import engine
    from scarlet_tpu.ops.prox import NEIGHBOR_OFFSETS

    S, K, B = 59, 10, args.batch
    Hb, Wb, gW = S, S, K * S
    wtab_np, keep_np, depth = engine.monotonicity_tables((S, S), 1, "angle")

    # Pre-gather the per-slot pre-shifted weight tables on the host once
    # (every slot uses candidate 0 here, like roofline_mono.py) so the
    # variant kernels skip the scratch-gather prologue — it is amortized
    # over all passes in production and irrelevant to the per-pass slope.
    wsel = np.zeros((8, Hb, gW), np.float32)
    keepsel = np.zeros((Hb, gW), np.float32)
    for g in range(K):
        c0 = g * Wb
        for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            lo, hi = max(0, dx), Wb + min(0, dx)
            wsel[d, :, c0 + lo:c0 + hi] = wtab_np[0, d][:, lo - dx:hi - dx]
        keepsel[:, c0:c0 + Wb] = keep_np[0]
    wsel = jnp.asarray(wsel)
    keepsel = jnp.asarray(keepsel)

    UNROLL_DEFAULT = 4

    def make_kernel(mix, n_iter, unroll=UNROLL_DEFAULT):
        """A (1, Hb, gW)-block kernel running ``n_iter`` forced passes of
        the selected instruction mix (production step mirrored from
        ops/pallas_kernels.py:_mono_kernel)."""

        def kernel(x_ref, w_ref, keep_ref, out_ref):
            x0 = x_ref[0]
            w = w_ref[:]
            keep_b = keep_ref[:] > 0.5

            def step_full(x, rolls=True):
                if rolls:
                    rows = {-1: pltpu.roll(x, 1, 0), 0: x,
                            1: pltpu.roll(x, Hb - 1, 0)}
                else:
                    rows = {-1: x, 0: x, 1: x}
                cols = {-1: None, 0: None, 1: None}
                for d, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
                    t = w[d] * rows[dy]
                    cols[dx] = t if cols[dx] is None else cols[dx] + t
                if rolls:
                    ref = (cols[0] + pltpu.roll(cols[-1], 1, 1)
                           + pltpu.roll(cols[1], gW - 1, 1))
                else:
                    ref = cols[0] + cols[-1] + cols[1]
                new = jnp.minimum(x0, ref)
                return jnp.where(keep_b, x0, new)

            def step_rollsonly(x):
                return (pltpu.roll(x, 1, 0) + pltpu.roll(x, Hb - 1, 0)
                        + pltpu.roll(x, 1, 1)
                        + pltpu.roll(x, gW - 1, 1)) * 0.25

            def step_alu8(x):
                # 8 multiply-adds in an FMA-pairable chain (w[d] varies so
                # nothing folds); matches the stencil's 8 mul + 8 add load
                acc = x
                for d in range(8):
                    acc = acc * 0.5 + w[d]
                return acc

            if mix in ("full", "noreduce", "unroll8"):
                step = step_full
            elif mix == "norolls":
                step = functools.partial(step_full, rolls=False)
            elif mix == "rollsonly":
                step = step_rollsonly
            elif mix == "alu8":
                step = step_alu8
            elif mix == "bf16":
                x0 = x0.astype(jnp.bfloat16)
                w = w.astype(jnp.bfloat16)
                step = functools.partial(step_full, rolls=False)
            else:
                raise ValueError(mix)

            if mix == "noreduce":
                # counter-only loop: no convergence reduce, no flag in the
                # carry (a Python-constant bool in the carry trips Mosaic's
                # scf.while verifier — and semantically this variant is
                # exactly "the pass without the exit machinery")
                def cond(c):
                    t, _ = c
                    return t < n_iter

                def body(c):
                    t, x = c
                    for _ in range(unroll):
                        x = step(x)
                    return t + unroll, x

                _, out = jax.lax.while_loop(cond, body, (0, x0))
            else:
                def cond(c):
                    t, _, changed = c
                    return changed & (t < n_iter)

                def body(c):
                    t, x, _ = c
                    for _ in range(unroll - 1):
                        x = step(x)
                    new = step(x)
                    # forced: max|delta| > -1 is always true (mirrors the
                    # dynamic-tol never-exit calibration in roofline_mono)
                    changed = jnp.max(jnp.abs(new - x)
                                      .astype(jnp.float32)) > -1.0
                    return t + unroll, new, changed

                _, out, _ = jax.lax.while_loop(cond, body, (0, x0, True))
            out_ref[0] = out.astype(out_ref.dtype)

        return kernel

    def build(mix, n_iter):
        unroll = 8 if mix == "unroll8" else UNROLL_DEFAULT
        kernel = make_kernel(mix, n_iter, unroll)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, Hb, gW), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=bool(args.cpu),
        )
        return jax.jit(jax.vmap(
            lambda p: call(p[None], wsel, keepsel)[0]))

    rng = np.random.RandomState(0)
    packed = jnp.asarray(rng.rand(B, Hb, gW).astype(np.float32))

    variants = args.variants or ["full", "noreduce", "unroll8", "norolls",
                                 "rollsonly", "alu8", "bf16"]
    counts = [8, 88, 200, 352] if not args.cpu else [8, 16]
    report = {}
    for mix in variants:
        med = []
        for n in counts:
            try:
                f = build(mix, n)
                out = f(packed)
                jax.block_until_ready(out)
            except Exception as e:  # a variant Mosaic rejects is a FINDING
                report[mix] = {"error": str(e).split("\n")[0][:200]}
                print(f"{mix:10s} FAILED: {report[mix]['error']}",
                      file=sys.stderr)
                break
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(packed))
                ts.append(time.perf_counter() - t0)
            med.append(float(np.median(ts)))
            print(f"{mix:10s} passes={n:3d}  median {med[-1]*1e3:8.3f} ms",
                  file=sys.stderr)
        if len(med) < len(counts):  # variant failed to compile
            continue
        xs = np.array(counts, float)
        ys = np.array(med)
        A = np.vstack([xs, np.ones_like(xs)]).T
        (tau_b, ovh_b), *_ = np.linalg.lstsq(A, ys, rcond=None)
        r2 = 1 - np.sum((A @ [tau_b, ovh_b] - ys) ** 2) / max(
            np.sum((ys - ys.mean()) ** 2), 1e-30)
        report[mix] = {
            "tau_us_per_pass_per_call": round(tau_b / B * 1e6, 4),
            "overhead_us_per_call": round(ovh_b / B * 1e6, 3),
            "r2": round(float(r2), 5),
        }

    # correctness cross-check: the 'full' variant at a forced pass count
    # must match the production packed kernel at the same forced count
    from scarlet_tpu.ops.pallas_kernels import monotonic_prox_packed
    never = jnp.asarray(-1.0, jnp.float32)
    idx = jnp.zeros((K,), jnp.int32)
    n_chk = 16
    ref_out = jax.vmap(lambda p: monotonic_prox_packed(
        p, idx, jnp.asarray(wtab_np, jnp.float32),
        jnp.asarray(keep_np, jnp.float32), Wb, n_chk,
        interpret=bool(args.cpu), tol_arr=never))(packed[:4])
    var_out = build("full", n_chk)(packed[:4])
    max_diff = float(jnp.max(jnp.abs(ref_out - var_out)))

    # derived attribution (per pass per call, us)
    d = {}
    ok = {k for k, v in report.items() if "tau_us_per_pass_per_call" in v}
    if {"full", "norolls"} <= ok:
        d["rolls_by_delta"] = round(
            report["full"]["tau_us_per_pass_per_call"]
            - report["norolls"]["tau_us_per_pass_per_call"], 4)
    if {"full", "noreduce"} <= ok:
        d["reduce_carry"] = round(
            report["full"]["tau_us_per_pass_per_call"]
            - report["noreduce"]["tau_us_per_pass_per_call"], 4)

    print(json.dumps({
        "metric": "mono_pass_attribution",
        "shape": f"B{B} x (59,590) f32",
        "variants": report,
        "derived_us": d,
        "full_vs_production_max_diff": max_diff,
    }))


if __name__ == "__main__":
    main()
