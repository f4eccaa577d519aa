"""The public API surface the reference exposes (scarlet/__init__.py:1-61
plus module namespaces) must exist here so a reference user can switch."""
import os

import numpy as np

import scarlet_tpu as st


TOP_LEVEL = [
    # bbox / cache / wavelets
    "Box", "Cache", "Starlet",
    # model tree
    "Parameter", "relative_step", "Model", "UpdateException", "Prior",
    # constraints (constraint.py:1-301)
    "Constraint", "ConstraintChain", "PositivityConstraint",
    "NormalizationConstraint", "L0Constraint", "L1Constraint",
    "ThresholdConstraint", "MonotonicityConstraint",
    "MonotonicMaskConstraint", "SymmetryConstraint", "CenterOnConstraint",
    "LeakyConstraint",
    # PSFs (psf.py)
    "PSF", "FunctionPSF", "GaussianPSF", "MoffatPSF", "ImagePSF",
    # frames / observations / renderers
    "Frame", "Observation", "Renderer", "NullRenderer",
    "ConvolutionRenderer", "ResolutionRenderer",
    # spectra / morphologies (spectrum.py, morphology.py)
    "Spectrum", "TabulatedSpectrum", "Morphology", "ImageMorphology",
    "ProfileMorphology", "GaussianMorphology", "SpergelMorphology",
    "PointSourceMorphology", "StarletMorphology",
    "ExtendedSourceMorphology",
    # components / sources (component.py, source.py)
    "Component", "FactorizedComponent", "CubeComponent",
    "CombinedComponent", "NullSource", "RandomSource", "PointSource",
    "GaussianSource", "SpergelSource", "CompactExtendedSource",
    "SingleExtendedSource", "MultiExtendedSource", "StarletSource",
    "ExtendedSource",
    # fitting
    "Blend",
]

MODULES = ["detect", "display", "initialization", "measure", "operator",
           "testing", "lite"]


def test_top_level_names():
    missing = [n for n in TOP_LEVEL if not hasattr(st, n)]
    assert not missing, f"missing top-level names: {missing}"


def test_module_namespaces():
    missing = [n for n in MODULES if not hasattr(st, n)]
    assert not missing, f"missing module namespaces: {missing}"


def test_operator_namespace():
    """scarlet.operator's key symbols (reference operator.py:10-667)."""
    for n in ["sort_by_radius", "prox_weighted_monotonic",
              "prox_monotonic_mask", "prox_cone", "uncentered_operator",
              "prox_sdss_symmetry", "prox_soft_symmetry",
              "prox_kspace_symmetry", "prox_uncentered_symmetry",
              "project_disk_sed", "getOffsets", "diagonalizeArray",
              "getRadialMonotonicWeights"]:
        assert hasattr(st.operator, n), n
    # and it is callable through this namespace
    x = np.abs(np.random.RandomState(0).randn(11, 11)).astype(np.float32)
    f = st.operator.build_prox_monotonic((11, 11), neighbor_weight="angle")
    out = np.asarray(f(x))
    assert out.shape == (11, 11)


def test_profiling_utils():
    """SURVEY §5.1: profiler wrapper + device-synced timing."""
    from scarlet_tpu.utils import timeit, sync, annotate
    import jax.numpy as jnp

    def f(a):
        return a * 2.0

    t = timeit(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert t >= 0.0
    with annotate("scarlet-test"):
        out = sync(f(jnp.ones((4,))))
    assert float(out[0]) == 2.0


def test_import_is_backend_neutral():
    """`import scarlet_tpu` must not initialize any JAX backend: a
    module-level device array would hang every consumer when the
    environment pins an unreachable accelerator, and would defeat
    consumers' later jax_platforms pins (regression: ops/special's
    quadrature tables)."""
    import subprocess
    import sys

    code = (
        "import scarlet_tpu, scarlet_tpu.testing, scarlet_tpu.parallel\n"
        "from jax._src import xla_bridge as xb\n"
        "assert not xb.backends_are_initialized(), 'import initialized a backend'\n"
        "print('neutral')\n"
    )
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # no JAX_PLATFORMS / config pin: the import must be safe even when
    # the environment's default backend is an unreachable tunnel
    result = subprocess.run([sys.executable, "-c", code],
                            capture_output=True, text=True, timeout=240,
                            env=env)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "neutral" in result.stdout
