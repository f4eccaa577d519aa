"""Displaying scenes: Lupton RGB mapping, channel maps, and the display
helpers (the reference's docs/tutorials/display.ipynb flow, scripted).

Covers the full surface the reference tutorial demonstrates:
norm sweep (AsinhMapping stretch/Q grid), `channels_to_rgb` defaults,
custom channel maps, `show_scene` model/rendered/observed/residual
panels, `show_sources` (incl. passing ONE multi-component source to see
its components), `show_observation` with the PSF panel, and the
likelihood history.

Run from the repo root:  python examples/display_tutorial.py
"""
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import jax

# host-side pipeline: init + a single blend fit run well on CPU
jax.config.update("jax_platforms", "cpu")

import scarlet_tpu as st
from scarlet_tpu.display import (
    AsinhMapping, channels_to_rgb, img_to_rgb)

data = np.load("/root/reference/data/hsc_cosmos_35.npz", allow_pickle=True)
images = data["images"].astype(np.float32)
weights = (1 / np.maximum(data["variance"], 1e-12)).astype(np.float32)
channels = list("grizy")

obs = st.Observation(images, psf=st.ImagePSF(data["psfs"].astype(np.float32)),
                     weights=weights, channels=channels)

# --- norm sweep (ref display.ipynb cell 1): arcsinh intensity scaling
# f(x) = asinh(Q (x - min)/stretch)/Q preserves color from bright to faint —
# pick stretch/Q by eye on a 3x3 grid -----------------------------------------
fig, ax = plt.subplots(3, 3, figsize=(9, 12))
for i, stretch in enumerate([0.01, 0.1, 1]):
    for j, Q in enumerate([1, 10, 100]):
        asinh = AsinhMapping(minimum=0, stretch=stretch, Q=Q)
        img_rgb = img_to_rgb(images, norm=asinh)
        assert img_rgb.shape == images.shape[1:] + (3,)
        ax[i][j].imshow(img_rgb)
        ax[i][j].set_title(f"Stretch {stretch}, Q {Q}")
        ax[i][j].axis("off")
fig.savefig("display_norm_sweep.png", dpi=80)
plt.close(fig)
print("wrote display_norm_sweep.png")

# Q=10, stretch=0.1 looks reasonable; minimum=0 renders negative sky as black
# (fine for background-subtracted images)
norm = AsinhMapping(minimum=0, stretch=0.1, Q=10)

# --- channel maps (ref cells 6-8): a (3, C) linear map takes C wavelength-
# ordered bands onto RGB before the intensity norm ---------------------------
print("Mapping from 1 band to RGB:\n", channels_to_rgb(1))
print("Mapping from 3 bands to RGB:\n", channels_to_rgb(3))
print("Mapping from 5 bands to RGB:\n", channels_to_rgb(5))

# de-weight the noisy reddest (Y) band in the red display channel
channel_map = channels_to_rgb(5)
channel_map[0, :] = [0, 0, 0.2, 0.5, 0.3]
channel_map /= channel_map.sum(axis=1)[:, None]
print("New channel map:\n", channel_map)

fig, ax = plt.subplots(1, 2, figsize=(9, 12))
ax[0].imshow(img_to_rgb(images, norm=norm))
ax[0].set_title("Default")
ax[0].axis("off")
ax[1].imshow(img_to_rgb(images, norm=norm, channel_map=channel_map))
ax[1].set_title("Less Y")
ax[1].axis("off")
fig.savefig("display_channel_map.png", dpi=80)
plt.close(fig)
print("wrote display_channel_map.png")

# --- fit a quick model to display (the quickstart scene) --------------------
model_frame = st.Frame(images.shape, channels=channels,
                       psf=st.GaussianPSF(sigma=0.8, boxsize=15))
obs = obs.match(model_frame)
centers = [(float(r["y"]), float(r["x"])) for r in data["catalog"]]
sources, skipped = st.initialization.init_all_sources(
    model_frame, centers, obs, max_components=2, min_snr=30, silent=True)
blend = st.Blend(sources, obs)
max_iter = 12 if os.environ.get("SCARLET_TPU_FAST") else 60
it, logL = blend.fit(max_iter, e_rel=1e-4)
print(f"fit: {it} iterations, logL = {logL:.1f}")

# --- show_scene (ref cells 10-13): model alone, then model/rendered/
# observed/residual against the matched observation --------------------------
fig = st.display.show_scene(sources, norm=norm, channel_map=channel_map)
fig.savefig("display_scene_model.png", dpi=80)
plt.close(fig)

fig = st.display.show_scene(
    sources, observation=obs, norm=norm, channel_map=channel_map,
    show_rendered=True, show_observed=True, show_residual=True,
    add_boxes=True)
fig.savefig("display_scene_full.png", dpi=80)
plt.close(fig)
print("wrote display_scene_model.png display_scene_full.png")

# --- show_sources (ref cells 15-17): every source with its spectrum; then
# ONE multi-component source passed directly — the Model tree is iterable
# (ref scarlet/model.py:62-66), so its components are shown individually ------
fig = st.display.show_sources(sources, norm=norm, channel_map=channel_map)
fig.savefig("display_sources.png", dpi=80)
plt.close(fig)

multi = next(s for s in sources if len(s.children) > 1)
assert list(multi) == list(multi.children) and multi[0] is multi.children[0]
fig = st.display.show_sources(
    multi, norm=norm, channel_map=channel_map, observation=obs,
    show_rendered=True, show_observed=True, add_markers=True)
fig.savefig("display_source_components.png", dpi=80)
plt.close(fig)
print("wrote display_sources.png display_source_components.png")

# --- show_observation with the PSF panel + likelihood history ---------------
fig = st.display.show_observation(
    obs, norm=norm, channel_map=channel_map, sky_coords=centers,
    show_psf=True)
fig.savefig("display_observation.png", dpi=80)
plt.close(fig)

fig = st.display.show_likelihood(blend)
fig.savefig("display_likelihood.png", dpi=80)
plt.close(fig)
print("wrote display_observation.png display_likelihood.png")
