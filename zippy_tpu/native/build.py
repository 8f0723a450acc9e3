"""Build the native runtime shared library on demand.

Compiles zippy_native.cpp with g++ the first time it's needed (or when the
source is newer than the cached .so). No external build system required.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import tempfile

_SRC = pathlib.Path(__file__).parent / "src" / "zippy_native.cpp"
_LIB = pathlib.Path(__file__).parent / "libzippy_native.so"

CXXFLAGS = [
    "-O3",
    "-std=c++17",
    "-fPIC",
    "-shared",
    "-fno-exceptions",
    "-march=native",
    "-pthread",
    "-Wall",
]


def ensure_built() -> pathlib.Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    # Build to a temp file then atomically rename (safe under concurrent use).
    with tempfile.NamedTemporaryFile(
        dir=_LIB.parent, suffix=".so", delete=False
    ) as tmp:
        tmp_path = tmp.name
    cmd = ["g++", *CXXFLAGS, str(_SRC), "-o", tmp_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        os.unlink(tmp_path)
        raise RuntimeError(
            f"native build failed:\n{e.stderr}\ncommand: {' '.join(cmd)}"
        ) from e
    os.replace(tmp_path, _LIB)
    return _LIB
