"""Batched deblending: fit many blends at once with the compiled engine,
optionally sharded across a device mesh.

Run:  python examples/batched_deblending.py  (uses the default backend; on a
TPU machine this runs on the chip)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scarlet_tpu import lite, parallel

# ---- load one blend and initialize it (host-side) ----
data = np.load("/root/reference/data/hsc_cosmos_35.npz", allow_pickle=True)
images = data["images"].astype(np.float32)
variance = data["variance"].astype(np.float32)
weights = (1 / np.maximum(variance, 1e-12)).astype(np.float32)

with jax.default_device(jax.devices("cpu")[0]):
    obs = lite.LiteObservation(
        images, variance, weights, data["psfs"].astype(np.float32),
        model_psf=lite.integrated_circular_gaussian(sigma=0.8)[None].astype(
            np.float32))
    centers = [(int(round(r["y"])), int(round(r["x"])))
               for r in data["catalog"]]
    sources = lite.parameterize_sources(
        lite.init_all_sources_main(obs, centers), obs,
        lite.init_adaprox_component)
    blend = lite.LiteBlend(sources, obs)
    config, blend_data, state = blend.engine_setup(e_rel=1e-4)

# ---- replicate into a batch (in production: pack_batch over many blends) --
import os
FAST = bool(os.environ.get("SCARLET_TPU_FAST"))
BATCH = 8 if FAST else 256
bdata, bstate = parallel.replicate_blend(blend_data, state, BATCH)

# optional: shard over every available device
mesh = parallel.make_mesh()
bdata, bstate = parallel.shard_batch(bdata, bstate, mesh)

with mesh:
    # warmup/compile
    iters = 10 if FAST else 100
    out, losses = parallel.fit_batch_converged(bstate, bdata, config, iters)
    _ = float(jnp.sum(out.last_loss))

    t0 = time.perf_counter()
    out, losses = parallel.fit_batch_converged(bstate, bdata, config, iters)
    _ = float(jnp.sum(out.last_loss))
    dt = time.perf_counter() - t0

print(f"{BATCH} blends x {losses.shape[0]} iterations in {dt:.2f}s "
      f"= {BATCH / dt * 60:.0f} blends/min on {len(mesh.devices.flat)} device(s)")
print(f"median final logL: {float(jnp.median(losses[-1])):.1f}")
