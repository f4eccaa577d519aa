"""Regression/benchmark harness.

Mirrors the reference's scarlet/testing package (api.py, deblend.py,
measure.py, aws.py, settings.py) with local-filesystem storage instead of
AWS DynamoDB/S3: records land as JSON under ``.regression/<branch>/`` and
residual images as npz alongside.
"""
from . import settings  # noqa: F401
from .deblend import deblend  # noqa: F401
from .measure import measurements, mag_diff  # noqa: F401
from .store import save_records, load_records, save_residuals  # noqa: F401
from .api import (  # noqa: F401
    deblend_and_measure,
    deblend_lite_batch,
    bundled_blends,
)
from .blendsets import generate_blend, generate_blend_set  # noqa: F401
from .plots import metric_distributions, render_dashboard  # noqa: F401
