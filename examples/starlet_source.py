"""Starlet (wavelet) morphology modeling: fit the brightest galaxy of the
HSC blend with a StarletSource (the reference's wavelet_model tutorial
flow) alongside ExtendedSources for its neighbors.

Run:  python examples/starlet_source.py
"""
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import jax

jax.config.update("jax_platforms", "cpu")

import scarlet_tpu as st

FAST = bool(os.environ.get("SCARLET_TPU_FAST"))

data = np.load("/root/reference/data/hsc_cosmos_35.npz", allow_pickle=True)
images = data["images"].astype(np.float32)
weights = (1 / np.maximum(data["variance"], 1e-12)).astype(np.float32)
channels = list("grizy")

model_frame = st.Frame(images.shape, channels=channels,
                       psf=st.GaussianPSF(sigma=0.8, boxsize=15))
obs = st.Observation(images, psf=st.ImagePSF(data["psfs"].astype(np.float32)),
                     weights=weights, channels=channels).match(model_frame)

centers = [(float(r["y"]), float(r["x"])) for r in data["catalog"]]

# detection via starlets (detect.py): peaks at the 2nd wavelet scale
peaks = st.detect.get_peaks(images=images,
                            variance=data["variance"].astype(np.float32))
print(f"wavelet detection found {len(peaks)} peaks "
      f"(catalog has {len(centers)})")

# the brightest source gets an overcomplete starlet morphology with
# per-scale sparsity; neighbors get standard extended sources
sources = [st.StarletSource(model_frame, centers[0], obs,
                            starlet_thresh=5e-3)]
for center in centers[1:]:
    sources.append(st.SingleExtendedSource(model_frame, center, obs))

blend = st.Blend(sources, obs)
max_iter = 12 if FAST else 80
it, logL = blend.fit(max_iter, e_rel=1e-4)
print(f"fit: {it} iterations, logL = {logL:.1f}")

starlet_model = np.asarray(sources[0].get_model())
print(f"starlet source: {starlet_model.shape} model, "
      f"flux {st.measure.flux(sources[0]).round(1)}")

fig = st.display.show_scene(sources, obs, show_rendered=True,
                            show_observed=True, show_residual=True)
fig.savefig("starlet_scene.png", dpi=90)
print("wrote starlet_scene.png")
