"""scarlet_tpu: a TPU-native (JAX/XLA/Pallas) multi-band source deblending
framework with the capabilities of pmelchior/scarlet.

Architecture: explicit forward models over static (bucketed) bounding boxes,
``jax.grad`` likelihood gradients, a pure ``lax.scan`` proximal-Adam
("adaprox") optimizer, and ``vmap``/``pjit`` batching of thousands of blends
per chip as the primary throughput axis.
"""

__version__ = "0.1.0"

from .bbox import Box, overlapped_slices  # noqa: F401
from .cache import Cache  # noqa: F401
from . import ops  # noqa: F401
from .ops.wavelet import Starlet  # noqa: F401
from . import initialization  # noqa: F401
from . import detect  # noqa: F401
from . import optim  # noqa: F401
from . import lite  # noqa: F401
from .models import (  # noqa: F401
    Parameter,
    prepare_param,
    relative_step,
    Model,
    UpdateException,
    Prior,
    Constraint,
    ConstraintChain,
    PositivityConstraint,
    NormalizationConstraint,
    L0Constraint,
    L1Constraint,
    ThresholdConstraint,
    MonotonicityConstraint,
    MonotonicMaskConstraint,
    SymmetryConstraint,
    CenterOnConstraint,
    LeakyConstraint,
    PSF,
    FunctionPSF,
    GaussianPSF,
    MoffatPSF,
    ImagePSF,
    Frame,
    Renderer,
    NullRenderer,
    ConvolutionRenderer,
    ResolutionRenderer,
    Observation,
    Spectrum,
    TabulatedSpectrum,
    Morphology,
    ImageMorphology,
    ProfileMorphology,
    GaussianMorphology,
    SpergelMorphology,
    PointSourceMorphology,
    StarletMorphology,
    ExtendedSourceMorphology,
    Component,
    FactorizedComponent,
    CubeComponent,
    CombinedComponent,
    NullSource,
    RandomSource,
    PointSource,
    GaussianSource,
    SpergelSource,
    CompactExtendedSource,
    SingleExtendedSource,
    MultiExtendedSource,
    StarletSource,
    ExtendedSource,
    Blend,
)
from . import measure  # noqa: F401
from . import display  # noqa: F401
from . import operator  # noqa: F401
from . import testing  # noqa: F401
