"""Local regression harness smoke test (the reference's AWS-gated
test_regressions.py equivalent, runnable locally)."""
import numpy as np

from scarlet_tpu import testing as harness

import pytest

pytestmark = pytest.mark.slow


def test_deblend_and_measure(tmp_path):
    results = harness.deblend_and_measure(
        set_ids=(2,), save=True, save_images=True, branch="test",
        root=tmp_path)
    records = results[2]
    assert len(records) == 1
    rec = records[0]
    assert rec["iterations"] > 1
    assert np.isfinite(rec["logL"])
    assert rec["logL"] > rec["init logL"]
    assert rec["n_sources"] == 7
    # per-source magnitude errors vs the sim truth within 0.75 mag
    diffs = [
        s[f"{c} diff"] for s in rec["sources"]
        for c in "ugrizy" if f"{c} diff" in s
    ]
    assert len(diffs) > 0
    assert np.median(np.abs(diffs)) < 0.75

    # records and residuals were stored
    stored = harness.load_records(2, branch="test", root=tmp_path)
    assert len(stored) == 1
    residuals = list((tmp_path / "test" / "residuals").glob("*.npz"))
    assert len(residuals) == 1


def test_deblend_hsc_cosmos_no_variance():
    """hsc_cosmos.npz has no variance plane: the harness's robust per-band
    MAD estimate must still produce a converging fit on real data."""
    d = np.load("/root/reference/data/hsc_cosmos.npz", allow_pickle=True)
    data = {k: d[k] for k in d.keys()}
    assert "variance" not in data
    sources, blend, rec = harness.deblend(data, max_iter=30)
    assert rec["n_sources"] == 6
    assert rec["iterations"] > 1
    assert np.isfinite(rec["logL"])
    assert rec["logL"] > rec["init logL"]


def test_deblend_unmatched_psf_sim(tmp_path):
    """Blend set 3 (psf_unmatched_sim.npz): per-band PSFs force per-band
    difference kernels in the renderer; flux recovery must survive the
    mismatch (reference BASELINE.json configs include this set)."""
    results = harness.deblend_and_measure(
        set_ids=(3,), save=False, branch="test", root=tmp_path)
    rec = results[3][0]
    assert rec["iterations"] > 1
    assert np.isfinite(rec["logL"])
    assert rec["logL"] > rec["init logL"]
    diffs = [
        s[f"{c} diff"] for s in rec["sources"]
        for c in "ugrizy" if f"{c} diff" in s
    ]
    assert len(diffs) > 0
    assert np.median(np.abs(diffs)) < 0.75
