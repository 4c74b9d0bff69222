"""Build helper for the native host kernels (g++ -> shared object).

No pybind11 in this environment; we compile a plain C-ABI shared library and
load it with ctypes.  The build is cached next to the source and keyed on the
source mtime, so the first import pays ~1s of g++ once.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SRC = os.path.join(os.path.dirname(__file__), "host_kernels.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_host_kernels.so")


def shared_object_path(build: bool = True) -> str | None:
    """Return the path of the compiled library, building it if needed."""
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    if not build:
        return _SO if os.path.exists(_SO) else None
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fvisibility=default",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:  # pragma: no cover
        msg = getattr(exc, "stderr", str(exc))
        print(f"lanczos_tpu.native: build failed, falling back to python: {msg}", file=sys.stderr)
        return _SO if os.path.exists(_SO) else None
    return _SO
