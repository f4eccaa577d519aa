"""Ablate the fused morph kernel and the bulk-upload path on the chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np

def timed(fn, n=3):
    import jax
    outs = fn(); jax.block_until_ready(jax.tree.leaves(outs))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); outs = fn()
        jax.block_until_ready(jax.tree.leaves(outs))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2], ts

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import batch as batch_mod
    import bench

    t00 = time.perf_counter()
    def t(m): print(f"[{time.perf_counter()-t00:7.1f}s] {m}", flush=True)

    d = bench.load_data()
    cpu = jax.devices("cpu")[0]
    plat = jax.devices()[0].platform
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"], d["centers"])
        config, data, state = blend.engine_setup(e_rel=1e-4, platform=plat)

    for fuse in (False, True):
        cfg = dataclasses.replace(config, fuse_morph=fuse)
        for B in (128, 512):
            bdata, bstate = parallel.replicate_blend(data, state, B)
            # materialize: broadcast-view state makes repeat invocations
            # return instantly (timing artifact)
            bstate = jax.tree.map(
                lambda x: None if x is None else jnp.asarray(np.asarray(x)),
                bstate, is_leaf=lambda x: x is None)
            jax.block_until_ready(jax.tree.leaves(bstate))
            def fit():
                st2 = jax.tree.map(lambda x: None if x is None else jnp.copy(x),
                                   bstate, is_leaf=lambda x: x is None)
                return batch_mod._fit_batch_while_jit(st2, bdata, cfg, 100, 25)
            med, ts = timed(fit)
            t(f"fit fuse={fuse} B={B}: {med*1e3:.0f} ms ({B/med*60:.0f} bl/min) "
              f"{[f'{x*1e3:.0f}' for x in ts]}")
            del bdata, bstate

    # e2e with/without device-resident inputs (bulk upload is now inside)
    variants = bench.make_variants(d, 256)
    e2e = tuple(np.stack([v[i] for v in variants]) for i in range(3))
    cent = np.stack([np.asarray(v[3]) for v in variants])
    def run_np(chunk):
        return parallel.deblend_device_stream(
            e2e[0], e2e[1], e2e[2], cent, bench._model_psf(),
            box_size=59, n_slots=10, max_iter=100, check_every=25, chunk=chunk)
    for chunk in (128, None):
        med, ts = timed(lambda: run_np(chunk))
        t(f"e2e numpy-in chunk={chunk}: {med:.3f}s ({256/med*60:.0f} bl/min) "
          f"{[f'{x:.3f}' for x in ts]}")

if __name__ == "__main__":
    main()
