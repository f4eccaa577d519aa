from .parameter import Parameter, prepare_param, relative_step  # noqa: F401
from .model import Model, UpdateException  # noqa: F401
from .prior import Prior  # noqa: F401
from .constraint import (  # noqa: F401
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
)
from .psf import PSF, FunctionPSF, GaussianPSF, MoffatPSF, ImagePSF, normalize  # noqa: F401
