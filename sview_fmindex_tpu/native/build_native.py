"""Build the native C++ extension: ``python -m sview_fmindex_tpu.native.build_native``."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["sais.cpp"]
OUTPUT = "libsview_native.so"


def build(verbose: bool = True) -> str:
    out = os.path.join(HERE, OUTPUT)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *(os.path.join(HERE, s) for s in SOURCES),
        "-o", out,
    ]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(path)
