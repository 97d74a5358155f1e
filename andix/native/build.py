"""Build the native host runtime shared library with g++.

Invoked on demand by ``andix.native`` (or manually: ``python -m
andix.native.build``).  Uses only the baked-in toolchain — no pip deps, no
pybind11; the ABI is plain C consumed via ctypes.
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCE = os.path.join(_DIR, "andix_native.cpp")
LIB = os.path.join(_DIR, "libandix.so")


def build(force: bool = False) -> str:
    """Compile libandix.so if missing or stale; returns its path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SOURCE)
    ):
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-fopenmp",
        "-shared",
        "-fPIC",
        "-o",
        LIB,
        SOURCE,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise RuntimeError(
            f"native build failed:\n{e.stderr}"
        ) from e
    except FileNotFoundError:  # pragma: no cover - g++ missing
        raise RuntimeError("g++ not available for native build")
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
