"""The `python -m scarlet_tpu deblend` batch CLI: npz files in, JSON
records out, through the device stream (here on the CPU backend)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def blend_files(tmp_path_factory):
    from scarlet_tpu.testing.blendsets import generate_blend

    root = tmp_path_factory.mktemp("blends")
    rng = np.random.default_rng(7)
    paths = []
    for i in range(3):
        b = generate_blend(rng)
        path = root / f"blend_{i}.npz"
        np.savez_compressed(path, images=b["images"],
                            variance=b["variance"], psfs=b["psfs"],
                            catalog=b["catalog"])
        paths.append(str(path))
    # one blend without a variance plane (CLI estimates it by MAD)
    b = generate_blend(rng)
    path = root / "blend_novar.npz"
    np.savez_compressed(path, images=b["images"], psfs=b["psfs"],
                        catalog=b["catalog"])
    paths.append(str(path))
    # one blend without a catalog (CLI runs host wavelet detection)
    b = generate_blend(rng)
    path = root / "blend_nocat.npz"
    np.savez_compressed(path, images=b["images"], variance=b["variance"],
                        psfs=b["psfs"])
    paths.append(str(path))
    return root, paths


def test_deblend_cli(blend_files, tmp_path):
    root, paths = blend_files
    out = tmp_path / "results.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [sys.executable, "-m", "scarlet_tpu", "deblend",
         str(root / "*.npz"), "--out", str(out), "--max-iter", "20",
         "--chunk", "4", "--cpu"],
        capture_output=True, text=True, timeout=600, env=env)
    assert result.returncode == 0, result.stderr[-2000:]

    res = json.loads(out.read_text())
    assert res["n_blends"] == len(paths)
    assert len(res["records"]) == len(paths)
    for rec in res["records"]:
        assert rec["n_sources"] >= 1
        assert np.isfinite(rec["logL"])
        assert rec["logL"] > rec["init_logL"]
        flux = np.asarray(rec["flux"])
        assert flux.shape == (rec["n_sources"], 5)
        cen = np.asarray(rec["centroid"])
        assert cen.shape == (rec["n_sources"], 2)
        assert len(rec["snr"]) == rec["n_sources"]

    # centroids recover the catalog positions
    data = np.load(res["records"][0]["file"], allow_pickle=True)
    truth = np.stack([data["catalog"]["y"], data["catalog"]["x"]], axis=1)
    cen = np.asarray(res["records"][0]["centroid"])
    err = np.linalg.norm(cen - truth, axis=1)
    assert np.median(err) < 2.0, err


def test_deblend_cli_device_detection(blend_files, tmp_path):
    """--detect device: catalogs come from parallel.detect_peaks_device
    (one batched program per shape group) and must match the host
    wavelet detection's peak sets (--detect host) file by file."""
    root, paths = blend_files
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = {}
    for mode in ("host", "device"):
        out = tmp_path / f"results_{mode}.json"
        result = subprocess.run(
            [sys.executable, "-m", "scarlet_tpu", "deblend",
             str(root / "*.npz"), "--out", str(out), "--max-iter", "10",
             "--detect", mode, "--cpu"],
            capture_output=True, text=True, timeout=600, env=env)
        assert result.returncode == 0, result.stderr[-2000:]
        outs[mode] = json.loads(out.read_text())
    for rh, rd in zip(outs["host"]["records"], outs["device"]["records"]):
        assert rh["file"] == rd["file"]
        assert rh["n_sources"] == rd["n_sources"]
        assert np.isfinite(rd["logL"])
        # same peak SET -> same fitted sources; only the catalog ORDER
        # differs (host is footprint order, device brightest-first), so
        # the lexicographically sorted centroids must agree
        ch = np.asarray(rh["centroid"], float)
        cd = np.asarray(rd["centroid"], float)
        ch = ch[np.lexsort(ch.T)]
        cd = cd[np.lexsort(cd.T)]
        np.testing.assert_allclose(cd, ch, atol=0.1)


def test_cli_help():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, "-m", "scarlet_tpu", "--help"],
        capture_output=True, text=True, timeout=120, env=env)
    assert result.returncode == 0
    assert "deblend" in result.stdout
