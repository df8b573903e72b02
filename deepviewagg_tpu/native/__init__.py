"""Native (C++) host kernels with lazy build and numpy fallback.

``lib`` is the compiled extension module or ``None``; consumers
(:mod:`deepviewagg_tpu.ops.voxel`, :mod:`deepviewagg_tpu.ops.kernel_map`)
fall back to their numpy implementations when native code is unavailable.
The extension is built once on first import with the system toolchain
(g++ via setuptools) into this package directory.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

_DIR = os.path.dirname(__file__)
lib = None


def _find_built():
    hits = glob.glob(os.path.join(_DIR, "_kernelmap*.so"))
    return hits[0] if hits else None


def _build() -> bool:
    """Compile the extension in-place; returns success."""
    import numpy as np
    import sysconfig

    src = os.path.join(_DIR, "kernelmap.cpp")
    out = os.path.join(_DIR, "_kernelmap.so")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        src, "-o", out,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(out)
    except Exception:
        return False


def _stale(so: str) -> bool:
    """A .so older than kernelmap.cpp silently shadows source edits."""
    src = os.path.join(_DIR, "kernelmap.cpp")
    try:
        return os.path.getmtime(src) > os.path.getmtime(so)
    except OSError:
        return False


def _load():
    global lib
    so = _find_built()
    if so is None or _stale(so):
        if os.environ.get("DVA_NO_NATIVE"):
            return
        if not _build() and so is None:
            return
    try:
        from . import _kernelmap  # type: ignore
        lib = _kernelmap
    except ImportError:
        lib = None


_load()
