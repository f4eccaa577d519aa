"""How much of the batched multires fit is the monotonicity projection?

The lite engine's mono kernel is 81% of its fit iteration and got the
Pallas VMEM treatment + the mono_tol exit; the multires fitter still
runs the pure-XLA Jacobi ``_mono_project`` at the full fixed-point depth
(parallel/multires.py:155).  Before porting any of that machinery,
measure the share: time the bench multires configuration with the full
depth vs depth=1 (TIMING ONLY — depth=1 breaks the projection semantics;
the delta is the mono tail's wall share, an upper bound on any
tol/kernel win).

Prints one JSON line.  Run on TPU:  python tools/multires_mono_share.py [B]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import scarlet_tpu as st
    from scarlet_tpu.parallel import MultiResFitter, multires_init
    from test_multiresolution import make_pair

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N_ITER = 100

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        obs_hr, obs_lr, data_hr, data_lr = make_pair(rotation_lr=0.0)
        frame = st.Frame.from_observations([obs_lr, obs_hr], obs_id=1)
    rng = np.random.default_rng(0)
    sc = (0.8 + 0.4 * rng.random(B).astype(np.float32))[:, None, None,
                                                        None]
    d_hr = np.repeat(data_hr[None][None], B, 0) * sc
    d_lr = np.repeat(data_lr[None][None], B, 0) * sc
    w_hr = np.full_like(d_hr, 400.0)
    w_lr = np.full_like(d_lr, 400.0)
    ra0, dec0 = 150.0, 2.0
    pts = []
    for dx, dy in [(0.0, 0.0), (0.9, -0.5), (-0.8, 0.7)]:
        ra = ra0 + dx / 3600 / np.cos(np.deg2rad(dec0))
        pts.append(np.asarray(frame.get_pixel((ra, dec0 + dy / 3600)),
                              float))
    centers = np.tile(np.asarray(pts)[None], (B, 1, 1))

    with jax.default_device(cpu):
        fitter = MultiResFitter((obs_hr, obs_lr), box_size=31)
        init = multires_init((obs_hr, obs_lr), (d_hr, d_lr), centers,
                             box_size=31, n_slots=3)

    t00 = time.perf_counter()

    def t(msg):
        print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", file=sys.stderr,
              flush=True)

    out = {"B": B, "n_iter": N_ITER, "full_depth": fitter._mono[2]}

    def timed(tag):
        def run():
            # min_iter=N_ITER: force every iteration in both arms so the
            # A/B is not contaminated by trajectory-dependent freezing
            r = fitter.fit((d_hr, d_lr), (w_hr, w_lr), *init,
                           n_iter=N_ITER, min_iter=N_ITER)
            jax.block_until_ready(r[2])
            return r

        run()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[1]
        out[tag] = {"s": round(med, 3),
                    "blends_per_min": round(B / med * 60.0, 1),
                    "spread": [round(x, 3) for x in sorted(ts)]}
        t(f"{tag}: {out[tag]}")

    timed("full")

    w8, keep, depth = fitter._mono
    fitter._mono = (w8, keep, 1)
    fitter._fit_jit = jax.jit(fitter._fit_impl,
                              static_argnames=("n_iter", "min_iter"))
    timed("depth1")

    full_s, d1_s = out["full"]["s"], out["depth1"]["s"]
    out["mono_tail_share"] = round(1.0 - d1_s / full_s, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
