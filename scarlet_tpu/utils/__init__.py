from .wcs import AffineWCS, make_tan_wcs  # noqa: F401
from .fits import read_fits  # noqa: F401
from .profiling import trace, annotate, sync, timeit  # noqa: F401
