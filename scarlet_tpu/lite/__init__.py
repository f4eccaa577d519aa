"""scarlet_tpu.lite: the fast path for single-instrument, same-grid
deblending — explicit analytic gradients, a fully jit-compiled fit loop, and
``vmap`` batching of many blends per chip.

Mirrors the capabilities of scarlet.lite (reference scarlet/lite/), which is
the architectural template for the whole TPU rebuild (SURVEY.md §7).
"""
from .utils import (  # noqa: F401
    insert_image,
    project_morph_to_center,
    integrated_gaussian,
    integrated_circular_gaussian,
    get_circle_mask,
)
from .parameters import LiteParameter, FistaParameter, AdaproxParameter  # noqa: F401
from .models import (  # noqa: F401
    LiteComponent,
    LiteFactorizedComponent,
    LiteSource,
    LiteObservation,
    LiteBlend,
)
from .measure import calculate_snr, weight_sources  # noqa: F401
from . import display  # noqa: F401
from .initialization import (  # noqa: F401
    get_min_psf,
    init_monotonic_morph,
    multifit_seds,
    init_main_parameters,
    init_adaprox_component,
    init_fista_component,
    init_all_sources_main,
    init_all_sources_wavelets,
    parameterize_sources,
)
