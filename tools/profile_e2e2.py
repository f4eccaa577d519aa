"""Careful phase timing of the device stream: block on ALL outputs, fresh
device buffers per call, 3 repeats each."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timed(fn, n=3):
    import jax
    outs = fn()          # warm
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
    import jax.numpy as jnp
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import stream as stream_mod
    from scarlet_tpu.parallel import batch as batch_mod

    import bench

    t00 = time.perf_counter()

    def t(msg):
        print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", flush=True)

    d = bench.load_data()
    model_psf = bench._model_psf()
    cpu = jax.devices("cpu")[0]
    fit_platform = jax.devices()[0].platform
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"],
                                  d["centers"])
        config, data, state = blend.engine_setup(e_rel=1e-4,
                                                 platform=fit_platform)
    t("setup done")

    variants = bench.make_variants(d, 256)
    e2e_images = np.stack([v[0] for v in variants])
    e2e_var = np.stack([v[1] for v in variants])
    e2e_psfs = np.stack([v[2] for v in variants])
    e2e_centers = np.stack([np.asarray(v[3]) for v in variants])

    # ---- upload alone ---------------------------------------------------
    for B in (128, 256):
        def up():
            return jax.device_put((e2e_images[:B], e2e_var[:B],
                                   e2e_psfs[:B]))
        med, times = timed(up)
        nb = (e2e_images[:B].nbytes + e2e_var[:B].nbytes
              + e2e_psfs[:B].nbytes) / 1e6
        t(f"upload B={B}: {med*1e3:.0f} ms median of "
          f"{[f'{x*1e3:.0f}' for x in times]} ({nb:.0f} MB, "
          f"{nb/med:.0f} MB/s)")

    # ---- init program (inputs pre-uploaded) -----------------------------
    for B in (128, 256):
        dev_in = jax.device_put((e2e_images[:B], e2e_var[:B], e2e_psfs[:B]))
        jax.block_until_ready(dev_in)

        def init():
            cfg, dd, st, aux = stream_mod.stream_setup(
                dev_in[0], dev_in[1], dev_in[2], e2e_centers[:B],
                model_psf, box_size=59, n_slots=10, e_rel=1e-4)
            return (st, aux)
        med, times = timed(init)
        t(f"init B={B}: {med*1e3:.0f} ms median of "
          f"{[f'{x*1e3:.0f}' for x in times]} = {med/B*1e3:.2f} ms/blend")

    # ---- fit program ----------------------------------------------------
    for B in (128, 256, 512):
        bdata, bstate = parallel.replicate_blend(data, state, B)
        bstate = jax.tree.map(
            lambda x: None if x is None else jnp.asarray(np.asarray(x)),
            bstate, is_leaf=lambda x: x is None)
        jax.block_until_ready(jax.tree.leaves(bstate))

        def fit():
            st2 = jax.tree.map(
                lambda x: None if x is None else jnp.copy(x), bstate,
                is_leaf=lambda x: x is None)
            out, losses, n = batch_mod._fit_batch_while_jit(
                st2, bdata, config, 100, 25)
            return (out, losses, n)
        med, times = timed(fit)
        t(f"fit B={B}: {med*1e3:.0f} ms median of "
          f"{[f'{x*1e3:.0f}' for x in times]} = {med/B*1e3:.2f} ms/blend "
          f"({B/med*60:.0f} bl/min)")
        del bdata, bstate

    # ---- init+fit+records end-to-end at B=256, pre-uploaded -------------
    dev_in = jax.device_put((e2e_images, e2e_var, e2e_psfs))
    jax.block_until_ready(dev_in)

    def full():
        cfg, dd, st, aux = stream_mod.stream_setup(
            dev_in[0], dev_in[1], dev_in[2], e2e_centers, model_psf,
            box_size=59, n_slots=10, e_rel=1e-4)
        out, losses = parallel.fit_batch_device_converged(
            st, dd, cfg, 100, check_every=25)
        recs = stream_mod.stream_records(out, losses, aux)
        return (out, recs)
    med, times = timed(full)
    t(f"pre-uploaded init+fit+records B=256: {med:.3f}s median of "
      f"{[f'{x:.3f}' for x in times]} = {256/med*60:.0f} bl/min")


if __name__ == "__main__":
    main()
