"""Throughput of the batched multi-resolution fitter on the attached
accelerator: B joint HSC+HST-like fits (synthetic aligned pair at the
real cutouts' scale ratio) as one compiled program.

Prints one JSON line.  Run:  python tools/multires_bench.py [B]
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

    # CPU-pin the object construction: the renderers precompute complex
    # FFT tensors, and complex buffers cannot cross the axon tunnel (the
    # jit would try to materialize them as constants at trace time)
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

    def run():
        out = fitter.fit((d_hr, d_lr), (w_hr, w_lr), *init, n_iter=N_ITER)
        jax.block_until_ready(out[2])
        return out

    run()   # warmup/compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    print(json.dumps({
        "metric": "joint 2-instrument multires fits/min "
                  f"(B={B}, {N_ITER} iter cap)",
        "blends_per_min": round(B / med * 60.0, 1),
        "median_s": round(med, 3),
        "spread_s": [round(x, 3) for x in sorted(ts)],
        "median_iterations": int(np.median(np.asarray(out[3]))),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
