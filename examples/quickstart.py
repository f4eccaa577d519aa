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

# --- save the fitted scene (reference: 0-quickstart.ipynb "hsc_cosmos_35.sca"
# pickle cells): sources pickle with their optimizer moments, so a reload
# warm-starts ----------------------------------------------------------------
import pickle

with open("hsc_cosmos_35.sca", "wb") as f:
    pickle.dump(sources, f)

with open("hsc_cosmos_35.sca", "rb") as f:
    sources2 = pickle.load(f)
model0 = blend.get_model()
blend2 = st.Blend(sources2, obs)
np.testing.assert_allclose(np.asarray(blend2.get_model()),
                           np.asarray(model0), rtol=1e-6)
print("pickle round trip: model preserved")

# refit the reloaded scene with an extra source added at the residual peak
# (the new source must share the reloaded sources' frame object — the same
# identity requirement as the reference, component.py:247)
resid = np.sum(np.asarray(obs.data) -
               np.asarray(obs.render(blend2.get_model())), axis=0)
py, px = np.unravel_index(np.argmax(resid), resid.shape)
frame2 = sources2[0].frame
new_src = st.CompactExtendedSource(frame2, (float(py), float(px)), obs)
sources2 = list(sources2) + [new_src]
blend2 = st.Blend(sources2, obs)
it2, logL2 = blend2.fit(3 * max_iter, e_rel=1e-4)
print(f"refit with added source at ({py}, {px}): "
      f"logL {-blend2.loss[0]:.1f} -> {logL2:.1f} in {it2} iterations")
# the new source initializes from the data (reference convention), so the
# combined model starts far off; the refit must recover it
assert blend2.loss[-1] < blend2.loss[0] / 20, "refit failed to recover"
if not os.environ.get("SCARLET_TPU_FAST"):
    assert logL2 >= logL - 1e-3, \
        "converged refit with an extra source degraded the fit"
