"""Run the example scripts end-to-end (the reference's docs-as-tests
strategy, SURVEY.md §4.2) in fast mode."""
import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"
REPO = str(EXAMPLES.parent)


@pytest.mark.parametrize("script", ["quickstart.py", "batched_deblending.py", "starlet_source.py", "multiresolution.py", "stream_deblending.py", "point_source.py", "multiscale_deblending.py", "display_tutorial.py", "lsbg_wavelet_model.py", "hsc_hst_multires.py"])
def test_example_runs(script, tmp_path):
    env = dict(os.environ)
    env["SCARLET_TPU_FAST"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    # the accelerator sitecustomize overrides JAX_PLATFORMS when the pool
    # env var is present; drop it so the doc-tests never touch the tunnel
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [sys.executable, str(EXAMPLES / script)],
        capture_output=True, text=True, cwd=tmp_path, timeout=420, env=env)
    assert result.returncode == 0, result.stderr[-2000:]
