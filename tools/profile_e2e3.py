"""Bisect the upload-path overhead: deblend_device_stream with numpy vs
device-resident inputs; stream_setup alone with numpy inputs."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timed(fn, n=3):
    import jax
    outs = fn()
    jax.block_until_ready(jax.tree.leaves(outs))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        outs = fn()
        jax.block_until_ready(jax.tree.leaves(outs))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], times


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import stream as stream_mod

    import bench

    t00 = time.perf_counter()

    def t(msg):
        print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", flush=True)

    d = bench.load_data()
    model_psf = bench._model_psf()
    variants = bench.make_variants(d, 256)
    e2e_images = np.stack([v[0] for v in variants])
    e2e_var = np.stack([v[1] for v in variants])
    e2e_psfs = np.stack([v[2] for v in variants])
    e2e_centers = np.stack([np.asarray(v[3]) for v in variants])

    # stream_setup alone, numpy inputs (upload inside)
    def setup_np():
        cfg, dd, st, aux = stream_mod.stream_setup(
            e2e_images, e2e_var, e2e_psfs, e2e_centers, model_psf,
            box_size=59, n_slots=10, e_rel=1e-4)
        return (st, aux)
    med, times = timed(setup_np)
    t(f"stream_setup numpy-in B=256: {med*1e3:.0f} ms of "
      f"{[f'{x*1e3:.0f}' for x in times]}")

    # full path, numpy inputs
    def run_np(chunk):
        return parallel.deblend_device_stream(
            e2e_images, e2e_var, e2e_psfs, e2e_centers, model_psf,
            box_size=59, n_slots=10, max_iter=100, check_every=25,
            chunk=chunk)

    for chunk in (None, 128):
        med, times = timed(lambda: run_np(chunk))
        t(f"deblend numpy-in chunk={chunk}: {med:.3f}s of "
          f"{[f'{x:.3f}' for x in times]} = {256/med*60:.0f} bl/min")

    # full path, device-resident inputs
    dev = jax.device_put((e2e_images, e2e_var, e2e_psfs))
    jax.block_until_ready(dev)

    def run_dev(chunk):
        return parallel.deblend_device_stream(
            dev[0], dev[1], dev[2], e2e_centers, model_psf,
            box_size=59, n_slots=10, max_iter=100, check_every=25,
            chunk=chunk)

    for chunk in (None, 128):
        med, times = timed(lambda: run_dev(chunk))
        t(f"deblend device-in chunk={chunk}: {med:.3f}s of "
          f"{[f'{x:.3f}' for x in times]} = {256/med*60:.0f} bl/min")


if __name__ == "__main__":
    main()
