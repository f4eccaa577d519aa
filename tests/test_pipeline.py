"""Multiprocess host pipeline: stream deblending end-to-end (init in
workers, batched fit, write-back + measurements in workers)."""
import numpy as np

from scarlet_tpu import parallel

import pytest

pytestmark = pytest.mark.slow


def _blobs(n=4):
    data = np.load("/root/reference/data/hsc_cosmos_35.npz",
                   allow_pickle=True)
    images = data["images"].astype(np.float32)
    variance = data["variance"].astype(np.float32)
    psfs = data["psfs"].astype(np.float32)
    centers = [(float(r["y"]), float(r["x"])) for r in data["catalog"]]
    rng = np.random.default_rng(5)
    out = []
    for i in range(n):
        noise = rng.standard_normal(images.shape).astype(np.float32) * \
            np.sqrt(variance) * np.float32(0.3)
        out.append({"images": images + noise, "variance": variance,
                    "psfs": psfs, "centers": centers})
    return out


class TestBlendPipeline:
    def test_stream_matches_in_process(self):
        blobs = _blobs(4)
        records = parallel.deblend_stream(
            blobs, parallel.build_lite_blend, max_iter=20, n_workers=2)
        assert len(records) == 4
        for rec in records:
            assert np.isfinite(rec["logL"])
            assert rec["logL"] > rec["init logL"]
            assert rec["n_sources"] >= 5
            assert len(rec["flux"]) == rec["n_sources"]

        # parity with the in-process path on blob 0
        bl = parallel.build_lite_blend(blobs[0])
        cfg, data, state = parallel.pack_blends([bl], e_rel=1e-4)
        out, losses = parallel.fit_batch_device_converged(
            state, data, cfg, 20, check_every=25)
        parallel.unpack_blends([bl], out, losses, reweight=False)
        # same data, same recipe -> same final loss (worker used the same
        # CPU backend); allow f32 noise
        np.testing.assert_allclose(records[0]["logL"], bl.loss[-1],
                                   rtol=1e-4)
