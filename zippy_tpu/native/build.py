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


def _compile(cmd: list[str], out: pathlib.Path) -> pathlib.Path:
    # Build to a temp file then atomically rename (safe under concurrent use).
    with tempfile.NamedTemporaryFile(
        dir=out.parent, suffix=".so", delete=False
    ) as tmp:
        tmp_path = tmp.name
    try:
        subprocess.run(
            cmd + ["-o", tmp_path], check=True, capture_output=True, text=True
        )
    except subprocess.CalledProcessError as e:  # pragma: no cover
        os.unlink(tmp_path)
        raise RuntimeError(
            f"native build failed:\n{e.stderr}\ncommand: {' '.join(cmd)}"
        ) from e
    os.replace(tmp_path, out)
    return out


def ensure_built() -> pathlib.Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    return _compile(["g++", *CXXFLAGS, str(_SRC)], _LIB)


_PYBIND_SRC = pathlib.Path(__file__).parent / "src" / "pybind.cpp"


def ensure_pyext_built() -> pathlib.Path:
    """Build the CPython extension module (_pyzt) that binds the codec with
    ~200 ns call overhead (vs ~3 us for ctypes — dominates small inputs)."""
    import sysconfig

    ext = _PYBIND_SRC.parent.parent / ("_pyzt" + sysconfig.get_config_var("EXT_SUFFIX"))
    srcs_mtime = max(_PYBIND_SRC.stat().st_mtime, _SRC.stat().st_mtime)
    if ext.exists() and ext.stat().st_mtime >= srcs_mtime:
        return ext
    # Exceptions stay enabled here (unlike the plain lib): a bad_alloc inside
    # a Python process must not abort the interpreter.
    flags = [f for f in CXXFLAGS if f != "-fno-exceptions"]
    inc = sysconfig.get_paths()["include"]
    return _compile(
        ["g++", *flags, f"-I{inc}", f"-I{_PYBIND_SRC.parent}", str(_PYBIND_SRC)],
        ext,
    )
