"""Joint HSC+HST deblending on the reference's real cutouts — the
multiresolution tutorial's dataset — through the BATCHED pipeline:
device detection on the HST image, compact-source init, and one
compiled joint fit against both instruments
(`parallel.deblend_multires`).

The HSC observation lives on a 3x coarser grid than the HST one, so it
renders through the sinc-resampling `ResolutionRenderer`; real WCS
headers are read without astropy (`utils.fits.read_fits`).

Run:  python examples/hsc_hst_multires.py
"""
import os

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import scarlet_tpu as st
from scarlet_tpu.parallel import deblend_multires
from scarlet_tpu.utils.fits import read_fits

FAST = bool(os.environ.get("SCARLET_TPU_FAST"))
REF = "/root/reference/data/test_resampling"

hsc, _, wcs_hsc = read_fits(os.path.join(REF, "Cut_HSC.fits"))
hst, _, wcs_hst = read_fits(os.path.join(REF, "Cut_HST.fits"))
psf_hsc, _, _ = read_fits(os.path.join(REF, "PSF_HSC.fits"))
psf_hst, _, _ = read_fits(os.path.join(REF, "PSF_HST.fits"))

obs_hsc = st.Observation(hsc, wcs=wcs_hsc, psf=st.ImagePSF(psf_hsc),
                         channels=["g", "r", "i", "z", "y"])
obs_hst = st.Observation(hst[None], wcs=wcs_hst,
                         psf=st.ImagePSF(psf_hst[None]),
                         channels=["F814W"])
frame = st.Frame.from_observations([obs_hsc, obs_hst],
                                   coverage="intersection")
print(f"model frame {frame.shape}; HSC renders through "
      f"{type(obs_hsc.renderer).__name__} "
      f"(rotated={obs_hsc.renderer.isrot})")

# batch of 2: the cutout and a 20%-brighter copy (stand-in for a stream
# of cutouts from the same survey pair)
B = 2
d_hst = np.stack([np.asarray(hst, np.float32)[None] * (1 + 0.2 * b)
                  for b in range(B)])
d_hsc = np.stack([np.asarray(hsc, np.float32) * (1 + 0.2 * b)
                  for b in range(B)])

records, seds, morphs, origins, active, losses = deblend_multires(
    (obs_hst, obs_hsc), (d_hst, d_hsc), centers=None, box_size=61,
    n_slots=12, detect_obs=0, n_iter=10 if FAST else 60)

act = np.asarray(active)
for b, rec in enumerate(records):
    print(f"blend {b}: {int(act[b].sum())} sources detected on the HST "
          f"image, {rec['iterations']} iterations, logL {rec['logL']:.0f}")
flux = np.asarray(records[0]["flux"]).sum(-1)
print("brightest sources (total flux):",
      np.sort(flux)[::-1][:5].round(1).tolist())
losses = np.asarray(losses)
assert np.all(np.isfinite(losses))
assert np.all(losses[-1] < losses[0])
# the brighter copy fits to a proportionally brighter model
f0 = np.asarray(records[0]["flux"]).sum()
f1 = np.asarray(records[1]["flux"]).sum()
print(f"flux ratio blend1/blend0: {f1 / f0:.3f} (true 1.2)")
print("OK")
