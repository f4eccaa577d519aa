"""Multi-resolution joint fit: a high-resolution and a coarser rotated
observation of the same scene fit with one model (the reference's
multiresolution tutorial flow, with synthetic instruments since astropy is
optional here).

Run:  python examples/multiresolution.py
"""
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import jax

jax.config.update("jax_platforms", "cpu")

import scarlet_tpu as st
from scarlet_tpu.utils import make_tan_wcs

FAST = bool(os.environ.get("SCARLET_TPU_FAST"))
crval = (150.0, 2.0)

# ---- two synthetic instruments observing three Gaussian blobs ----
blobs = [(100.0, 0.0, 0.0, 0.35), (40.0, 0.9, -0.5, 0.25),
         (25.0, -0.8, 0.7, 0.5)]


def gaussian_image(wcs, shape, blobs, pix):
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W].astype(float)
    world = wcs.pixel_to_world_values(
        np.stack([xx.ravel(), yy.ravel()], axis=1))
    dx = (world[:, 0] - crval[0]) * np.cos(np.deg2rad(crval[1])) * 3600
    dy = (world[:, 1] - crval[1]) * 3600
    img = np.zeros(H * W)
    for flux, bx, by, s in blobs:
        img += flux * pix ** 2 / (2 * np.pi * s ** 2) * np.exp(
            -((dx - bx) ** 2 + (dy - by) ** 2) / (2 * s ** 2))
    return img.reshape(H, W).astype(np.float32)


wcs_hr = make_tan_wcs(0.1, (64, 64), crval=crval)
wcs_lr = make_tan_wcs(0.3, (24, 24), crval=crval, rotation=np.deg2rad(25))

sig_hr, sig_lr = 0.12, 0.45
obs_blobs = lambda s: [(f, x, y, np.hypot(w, s)) for f, x, y, w in blobs]  # noqa: E731
data_hr = gaussian_image(wcs_hr, (64, 64), obs_blobs(sig_hr), 0.1)
data_lr = gaussian_image(wcs_lr, (24, 24), obs_blobs(sig_lr), 0.3)
psf_hr = gaussian_image(make_tan_wcs(0.1, (21, 21), crval=crval), (21, 21),
                        [(1, 0, 0, sig_hr)], 0.1)[None]
psf_lr = gaussian_image(
    make_tan_wcs(0.3, (21, 21), crval=crval, rotation=np.deg2rad(25)),
    (21, 21), [(1, 0, 0, sig_lr)], 0.3)[None]

obs_hr = st.Observation(data_hr[None], wcs=wcs_hr, psf=st.ImagePSF(psf_hr),
                        channels=["hr"],
                        weights=np.full((1, 64, 64), 1e4, np.float32))
obs_lr = st.Observation(data_lr[None], wcs=wcs_lr, psf=st.ImagePSF(psf_lr),
                        channels=["lr"],
                        weights=np.full((1, 24, 24), 1e4, np.float32))

model_frame = st.Frame.from_observations([obs_lr, obs_hr], obs_id=1)
print(f"model frame: {model_frame.shape}; "
      f"LR renderer: {type(obs_lr.renderer).__name__} "
      f"(rotated={obs_lr.renderer.isrot}, h={obs_lr.renderer.h:.2f})")

# one source per blob, fit jointly against both instruments
sky_coords = []
for _, bx, by, _ in blobs:
    ra = crval[0] + bx / 3600 / np.cos(np.deg2rad(crval[1]))
    dec = crval[1] + by / 3600
    sky_coords.append((ra, dec))

sources = [st.CompactExtendedSource(model_frame, c, [obs_hr, obs_lr])
           for c in sky_coords]
blend = st.Blend(sources, [obs_hr, obs_lr])
max_iter = 10 if FAST else 60
it, logL = blend.fit(max_iter, e_rel=1e-6)
print(f"joint fit: {it} iterations, logL = {logL:.1f}")

model = blend.get_model()
render_lr = np.asarray(obs_lr.render(model))[0]
sdr = 10 * np.log10(np.sum(data_lr ** 2) ** 0.5
                    / np.sum((data_lr - render_lr) ** 2) ** 0.5)
print(f"LR render SDR vs data: {sdr:.1f} dB")

# ---- the same joint fit, BATCHED (parallel.multires) ----------------------
# MultiResFitter compiles the whole adaprox loop over a batch of blends
# sharing this instrument pair: here 3 flux-scaled variants fit jointly
# against both observations as one program.
from scarlet_tpu.parallel import MultiResFitter, multires_init

scales = np.array([1.0, 0.7, 1.5], np.float32)
d_hr = np.stack([data_hr[None] * s for s in scales])
d_lr = np.stack([data_lr[None] * s for s in scales])
w_hr = np.full_like(d_hr, 1e4)
w_lr = np.full_like(d_lr, 1e4)
centers = np.tile(np.asarray(
    [np.asarray(model_frame.get_pixel(c), float) for c in sky_coords]
)[None], (len(scales), 1, 1))

fitter = MultiResFitter([obs_hr, obs_lr], box_size=31)
init = multires_init([obs_hr, obs_lr], [d_hr, d_lr], centers,
                     box_size=31, n_slots=3)
seds, morphs, loss, iters, losses = fitter.fit(
    [d_hr, d_lr], [w_hr, w_lr], *init, n_iter=max_iter * 2)
flux = (np.asarray(seds).sum(-1) * np.asarray(morphs).sum((-2, -1))).sum(-1)
print(f"batched joint fit ({len(scales)} blends): "
      f"iters {np.asarray(iters).tolist()}, "
      f"recovered flux ratios {np.round(flux / flux[0], 3).tolist()} "
      f"(true {np.round(scales / scales[0], 3).tolist()})")
