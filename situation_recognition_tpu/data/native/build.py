"""Build the native decoder shared library (g++ -O3 -shared -ljpeg).

Lazy: ``ensure_built()`` compiles on first use and caches the .so next to
the source; rebuilt when the source is newer than the library.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "decoder.cpp")
LIB = os.path.join(_DIR, "libsrtpu_decoder.so")


class NativeBuildError(RuntimeError):
    pass


def ensure_built(force: bool = False) -> str:
    """Compile decoder.cpp if needed; returns the .so path."""
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           SRC, "-ljpeg", "-pthread", "-o", LIB + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except FileNotFoundError as e:
        raise NativeBuildError(f"g++ not available: {e}") from e
    except subprocess.CalledProcessError as e:
        raise NativeBuildError(
            f"native decoder build failed:\n{e.stderr}") from e
    os.replace(LIB + ".tmp", LIB)
    return LIB


if __name__ == "__main__":
    print(ensure_built(force=True))
