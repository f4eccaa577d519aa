"""Quickstart: deblend the bundled real HSC blend (the reference's
docs/0-quickstart.ipynb flow, scripted).

Run from the repo root:  python examples/quickstart.py
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import jax

# host-side pipeline: init + a single blend fit run well on CPU; use
# scarlet_tpu.parallel for TPU-scale batches
jax.config.update("jax_platforms", "cpu")

import scarlet_tpu as st

data = np.load("/root/reference/data/hsc_cosmos_35.npz", allow_pickle=True)
images = data["images"].astype(np.float32)
weights = (1 / np.maximum(data["variance"], 1e-12)).astype(np.float32)
channels = list("grizy")

model_frame = st.Frame(images.shape, channels=channels,
                       psf=st.GaussianPSF(sigma=0.8, boxsize=15))
obs = st.Observation(images, psf=st.ImagePSF(data["psfs"].astype(np.float32)),
                     weights=weights, channels=channels).match(model_frame)

centers = [(float(r["y"]), float(r["x"])) for r in data["catalog"]]
sources, skipped = st.initialization.init_all_sources(
    model_frame, centers, obs, max_components=2, min_snr=30, silent=True)
print(f"initialized {len(sources)} sources (skipped {skipped})")

blend = st.Blend(sources, obs)
import os
max_iter = 12 if os.environ.get("SCARLET_TPU_FAST") else 100
it, logL = blend.fit(max_iter, e_rel=1e-4)
print(f"fit converged after {it} iterations to logL = {logL:.1f}")

for k, src in enumerate(sources):
    print(f"  source {k}: flux per band = "
          f"{np.round(st.measure.flux(src), 1)}")

fig = st.display.show_scene(
    sources, obs, show_observed=True, show_rendered=True, show_residual=True,
    norm=st.display.AsinhPercentileNorm(images))
fig.savefig("quickstart_scene.png", dpi=100)
print("wrote quickstart_scene.png")
