from . import fft, interpolation, prox, wavelet  # noqa: F401
