"""Does host->device bandwidth degrade after programs have run?

Fresh-process uploads measure ~680 MB/s, yet inside the e2e loop the same
38 MB bulk upload appears to cost ~0.9 s (~40 MB/s) even when the device
is idle.  This alternates timed uploads with fit programs in ONE process
to see whether (and when) the transfer rate collapses.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/scarlet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from scarlet_tpu import parallel
    from scarlet_tpu.parallel import batch as batch_mod
    import bench

    t00 = time.perf_counter()

    def t(msg):
        print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", flush=True)

    d = bench.load_data()
    variants = bench.make_variants(d, 256)
    blobs = tuple(np.stack([v[i] for v in variants]) for i in range(3))
    nbytes = sum(b.nbytes for b in blobs) / 1e6

    cpu = jax.devices("cpu")[0]
    plat = jax.devices()[0].platform
    with jax.default_device(cpu):
        blend = bench.build_blend(d["images"], d["variance"], d["psfs"],
                                  d["centers"])
        config, data, state = blend.engine_setup(e_rel=1e-4, platform=plat)
    bdata, bstate = parallel.replicate_blend(data, state, 128)
    bstate = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(np.asarray(x)),
        bstate, is_leaf=lambda x: x is None)
    jax.block_until_ready(jax.tree.leaves(bstate))

    def upload():
        t0 = time.perf_counter()
        x = jax.device_put(blobs)
        jax.block_until_ready(x)
        el = time.perf_counter() - t0
        t(f"upload {nbytes:.0f} MB: {el*1e3:.0f} ms ({nbytes/el:.0f} MB/s)")
        del x

    def fit():
        t0 = time.perf_counter()
        st2 = jax.tree.map(lambda x: None if x is None else jnp.copy(x),
                           bstate, is_leaf=lambda x: x is None)
        out = batch_mod._fit_batch_while_jit(st2, bdata, config, 100, 25)
        jax.block_until_ready(jax.tree.leaves(out))
        t(f"fit: {time.perf_counter()-t0:.3f}s")

    upload()
    upload()
    fit()
    upload()
    upload()
    fit()
    upload()
    time.sleep(2)
    upload()


if __name__ == "__main__":
    main()
