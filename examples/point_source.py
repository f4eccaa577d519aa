"""Point sources and galaxies in one scene (the reference's
docs/tutorials/point_source.ipynb flow, scripted): stars get
`PointSource` (PSF morphology, center free), galaxies get
`ExtendedSource`, and both fit together in one Blend.

Run from the repo root:  python examples/point_source.py
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

data = np.load("/root/reference/data/psf_unmatched_sim.npz",
               allow_pickle=True)
images = data["images"].astype(np.float32)
filters = [str(f) for f in data["filters"]]
psfs = data["psfs"].astype(np.float32)
catalog = data["catalog"]
# flat background noise estimate, as in the tutorial
weights = np.ones_like(images) / 2 ** 2

model_frame = st.Frame(images.shape, channels=filters,
                       psf=st.GaussianPSF(sigma=0.9))
obs = st.Observation(images, psf=st.ImagePSF(psfs), weights=weights,
                     channels=filters).match(model_frame)

sources, rows = [], []
for idx in np.unique(catalog["index"]):
    src = catalog[catalog["index"] == idx][0]
    coord = (float(src["y"]), float(src["x"]))
    if src["is_star"]:
        sources.append(st.PointSource(model_frame, coord, obs))
    else:
        sources.append(st.ExtendedSource(model_frame, coord, obs))
    rows.append(src)
n_star = int(np.sum([r["is_star"] for r in rows]))
print(f"initialized {len(sources)} sources ({n_star} stars)")

blend = st.Blend(sources, obs)
max_iter = 12 if os.environ.get("SCARLET_TPU_FAST") else 200
it, logL = blend.fit(max_iter, e_rel=1e-4)
print(f"fit ran {it} iterations to logL = {logL:.1f}")

# the fitted star centers track the catalog positions
for k, (src, row) in enumerate(zip(sources, rows)):
    if isinstance(src, st.PointSource):
        cy, cx = np.asarray(src.center)
        print(f"  star {k}: center=({cy:.2f}, {cx:.2f}) "
              f"truth=({row['y']:.2f}, {row['x']:.2f})")

norm = st.display.AsinhMapping(minimum=0, stretch=images.max() / 20, Q=10)
st.display.show_scene(sources, observation=obs, norm=norm,
                      show_rendered=True, show_observed=True,
                      show_residual=True)
plt.savefig("point_source_scene.png", dpi=72)
plt.close("all")
st.display.show_sources(sources, observation=obs, norm=norm,
                        show_rendered=True, show_observed=True,
                        add_boxes=True)
plt.savefig("point_source_sources.png", dpi=72)
plt.close("all")
st.display.show_likelihood(blend)
plt.savefig("point_source_likelihood.png", dpi=72)
plt.close("all")
print("wrote point_source_{scene,sources,likelihood}.png")

model = np.asarray(obs.render(blend.get_model()))
chi2 = float(np.mean(weights * (images - model) ** 2))
print(f"chi2/dof = {chi2:.3f}")
