from .wcs import AffineWCS, make_tan_wcs  # noqa: F401
from .fits import read_fits  # noqa: F401
