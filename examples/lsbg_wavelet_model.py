"""Low-surface-brightness galaxy modeling: the reference's
``wavelet_model.ipynb`` tutorial flow on its own bundled data (lsbg.pkl).

A full-frame :class:`StarletSource` (no center — ref source.py:569-571:
``sky_coord=None`` seeds from a RandomSource) absorbs the diffuse LSB
emission while compact sources model the point-like contaminants; the
LSBG is then separated from the scene by SED cosine similarity
(tutorial cell 23).

Run:  python examples/lsbg_wavelet_model.py
"""
import os
import pickle

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import jax

jax.config.update("jax_platforms", "cpu")

import scarlet_tpu as st
from scarlet_tpu.display import AsinhMapping

FAST = bool(os.environ.get("SCARLET_TPU_FAST"))
OUT = os.path.join(os.path.dirname(__file__), "out")
os.makedirs(OUT, exist_ok=True)


def load_lsbg():
    """lsbg.pkl embeds a pickled astropy WCS the tutorial never uses;
    unpickle tolerantly so astropy is not required."""

    class _Stub:
        def __init__(self, *a, **k):
            pass

        def __setstate__(self, state):
            pass

    class _TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {"__module__": module})

    with open("/root/reference/data/lsbg.pkl", "rb") as f:
        return _TolerantUnpickler(f).load()


data = load_lsbg()
images = np.asarray(data["images"], np.float32)
filters = list(data["channels"])
psfs = np.asarray(data["psfs"], np.float32)
print(f"lsbg field: {images.shape} in {filters}")

norm = AsinhMapping(minimum=0, stretch=1, Q=5)

# --- model frame + observation (tutorial cell 7) ---------------------------
model_frame = st.Frame(images.shape,
                       psf=st.GaussianPSF(sigma=0.8, boxsize=15),
                       channels=filters)
observation = st.Observation(images, psf=st.ImagePSF(psfs),
                             channels=filters).match(model_frame)

# --- wavelet detection (tutorial cells 9-13) -------------------------------
detect_image = np.sum(images, axis=0)
coeffs = np.asarray(st.ops.wavelet.starlet_transform(detect_image, scales=3))
M = st.ops.wavelet.get_multiresolution_support(
    detect_image, coeffs, 0.1, K=3, epsilon=1e-1, max_iter=20)
detect = M * coeffs
detect[detect < 0] = 0

# starlet round trip sanity (tutorial cell 11)
recon = np.asarray(st.ops.wavelet.starlet_reconstruction(coeffs))
assert np.allclose(recon, detect_image, atol=1e-4 * np.abs(detect_image).max())

footprints = st.detect.get_footprints(detect[1], min_separation=0,
                                      min_area=10, thresh=0)
peaks = [p for fp in footprints for p in fp.peaks]
print(f"{len(footprints)} footprints with {len(peaks)} peaks "
      "at the 2nd wavelet scale")

# --- sources: compact detections + one full-frame starlet source -----------
centers = [(p.y, p.x) for p in peaks]
sources, skipped = st.initialization.init_all_sources(
    model_frame, centers, observation, max_components=1, min_snr=50,
    thresh=1, fallback=True, silent=True, set_spectra=False)
print(f"{len(sources)} compact sources ({len(skipped)} skipped)")

np.random.seed(0)
sources.append(st.StarletSource(model_frame))

# --- fit (tutorial cell 17) ------------------------------------------------
blend = st.Blend(sources, observation)
n_iter, e_rel = (20, 1e-4) if FAST else (200, 1e-6)
it, logL = blend.fit(n_iter, e_rel=e_rel)
print(f"fit ran {it} iterations to logL = {logL:.1f}")

st.display.show_likelihood(blend)
plt.savefig(os.path.join(OUT, "lsbg_likelihood.png"), dpi=80)
plt.close("all")

st.display.show_scene(sources, norm=norm, observation=observation,
                      show_rendered=True, show_observed=True,
                      show_residual=True)
plt.savefig(os.path.join(OUT, "lsbg_scene.png"), dpi=80)
plt.close("all")

# --- LSBG separation by SED cosine similarity (tutorial cell 23) -----------
spectrum = np.asarray(sources[-1].spectrum.get_model())
C = np.zeros(len(sources))
for j, src in enumerate(sources):
    s = np.asarray(src.spectrum.get_model())
    C[j] = spectrum @ s / (np.linalg.norm(spectrum) * np.linalg.norm(s))

members = [j for j in range(len(sources)) if C[j] > 0.995]
print(f"sources with LSBG-like SEDs (cos > 0.995): {members}")
lsbg = sum(np.asarray(sources[j].get_model(frame=model_frame))
           for j in members)
lsbg_rendered = np.asarray(observation.render(lsbg))

fig, ax = plt.subplots(1, 3, figsize=(15, 5))
ax[0].imshow(st.display.img_to_rgb(images, norm=norm))
ax[0].set_title("Image")
ax[1].imshow(st.display.img_to_rgb(images - lsbg_rendered, norm=norm))
ax[1].set_title("Image - LSBG")
ax[2].imshow(st.display.img_to_rgb(lsbg_rendered, norm=norm))
ax[2].set_title("LSBG")
fig.savefig(os.path.join(OUT, "lsbg_separation.png"), dpi=80)
plt.close("all")

# the diffuse component must carry real flux
assert float(np.sum(lsbg_rendered)) > 0
print("figures written to", OUT)
