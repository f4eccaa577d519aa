"""Build the native kernel library: ``python -m scarlet_tpu.native.build``.

Compiles kernels.cc into libscarlet_tpu_native.so next to this file.
"""
from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent
SRC = HERE / "kernels.cc"
LIB = HERE / "libscarlet_tpu_native.so"


def build(verbose=True):
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        "-o", str(LIB), str(SRC),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build()
    print(f"built {LIB}")
    sys.exit(0)
