"""Where does the end-to-end stream time go?

Measures, on the real chip:
  1. fit-only (while-program) per-blend time at several batch sizes,
  2. the stream init program alone,
  3. the records program alone,
  4. the full deblend_device_stream at several chunk sizes.

Run: python tools/profile_e2e.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def t(msg, t0):
    print(f"[{time.perf_counter()-t0:7.1f}s] {msg}", flush=True)


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

    t0 = time.perf_counter()
    d = bench.load_data()
    model_psf = bench._model_psf()

    cpu = jax.devices("cpu")[0]
    fit_platform = jax.devices()[0].platform
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"],
                                  d["centers"])
        config, data, state = blend.engine_setup(e_rel=1e-4,
                                                 platform=fit_platform)
    t(f"setup done; scene={config.scene_shape} fft={config.fft_shape}", t0)

    # ---- 1. fit-only at several batch sizes -----------------------------
    for B in (128, 256, 512):
        bdata, bstate = parallel.replicate_blend(data, state, B)
        def run():
            out, losses, n = batch_mod._fit_batch_while_jit(
                jax.tree.map(lambda x: None if x is None else jnp.copy(x),
                             bstate, is_leaf=lambda x: x is None),
                bdata, config, 100, 25)
            jax.block_until_ready(out.last_loss)
            return out
        run()
        tt = time.perf_counter(); run(); el = time.perf_counter() - tt
        t(f"fit-only B={B}: {el:.3f}s = {el/B*1e3:.2f} ms/blend "
          f"({B/el*60:.0f} bl/min)", t0)
        del bdata, bstate

    # ---- 2/3. init + records programs alone -----------------------------
    variants = bench.make_variants(d, 256)
    e2e_images = np.stack([v[0] for v in variants])
    e2e_var = np.stack([v[1] for v in variants])
    e2e_psfs = np.stack([v[2] for v in variants])
    e2e_centers = np.stack([np.asarray(v[3]) for v in variants])

    for B in (128, 256):
        def init_run():
            cfg, dd, st, aux = stream_mod.stream_setup(
                e2e_images[:B], e2e_var[:B], e2e_psfs[:B],
                e2e_centers[:B], model_psf, box_size=59, n_slots=10,
                e_rel=1e-4)
            jax.block_until_ready(st.seds[0])
            return cfg, dd, st, aux
        init_run()
        tt = time.perf_counter()
        cfg, dd, st, aux = init_run()
        el = time.perf_counter() - tt
        t(f"init-program B={B}: {el:.3f}s = {el/B*1e3:.2f} ms/blend", t0)

        # upload cost alone (device_put of the raw stacks)
        tt = time.perf_counter()
        ims = jax.device_put(e2e_images[:B])
        va = jax.device_put(e2e_var[:B])
        ps = jax.device_put(e2e_psfs[:B])
        jax.block_until_ready((ims, va, ps))
        el = time.perf_counter() - tt
        nbytes = (e2e_images[:B].nbytes + e2e_var[:B].nbytes
                  + e2e_psfs[:B].nbytes)
        t(f"raw upload B={B}: {el:.3f}s for {nbytes/1e6:.1f} MB "
          f"({nbytes/el/1e6:.0f} MB/s)", t0)
        del ims, va, ps

        out, losses = parallel.fit_batch_device_converged(
            st, dd, cfg, 100, check_every=25)
        jax.block_until_ready(out.last_loss)
        def rec_run():
            return stream_mod.stream_records(out, losses, aux)
        rec_run()
        tt = time.perf_counter(); rec_run(); el = time.perf_counter() - tt
        t(f"records B={B}: {el:.3f}s = {el/B*1e3:.2f} ms/blend", t0)
        del cfg, dd, st, aux, out, losses

    # ---- 4. full e2e at several chunkings -------------------------------
    for chunk in (None, 64, 128, 256):
        def run_e2e():
            return parallel.deblend_device_stream(
                e2e_images, e2e_var, e2e_psfs, e2e_centers, model_psf,
                box_size=59, n_slots=10, max_iter=100, check_every=25,
                chunk=chunk)
        run_e2e()
        times = []
        for _ in range(3):
            tt = time.perf_counter()
            run_e2e()
            times.append(time.perf_counter() - tt)
        med = sorted(times)[1]
        t(f"e2e chunk={chunk}: median {med:.3f}s of {['%.3f' % x for x in times]}"
          f" = {256/med*60:.0f} bl/min", t0)


if __name__ == "__main__":
    main()
