"""Native (C++) components, built on demand with g++ and bound via ctypes.

Currently: the anti-aliased path rasterizer used by the built-in PDF
renderer (the reference's equivalent functionality lives in pdfium C++).
"""

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB = None


def _build_dir() -> Path:
    d = os.environ.get("YOMITOKU_TPU_NATIVE_DIR")
    if d:
        return Path(d)
    cand = _HERE / "_build"
    try:
        cand.mkdir(exist_ok=True)
        return cand
    except OSError:
        return Path(tempfile.gettempdir()) / "yomitoku_tpu_native"


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = _HERE / "rasterizer.cpp"
    out = _build_dir() / "librasterizer.so"
    if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
        out.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(str(out))
    lib.fill_edges.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.fill_edges.restype = None
    _LIB = lib
    return lib


def fill_edges(edges: np.ndarray, w: int, h: int, fill_rule: str = "nonzero"):
    """Rasterize a flattened edge list to an (h, w) uint8 coverage mask.

    edges: (N, 4) float32 array of x0,y0,x1,y1 segments in pixel coords
    (closed contours: consecutive segments; closure edges must be
    included).  fill_rule: "nonzero" or "evenodd".
    """
    lib = _load()
    edges = np.ascontiguousarray(edges, dtype=np.float32)
    out = np.zeros((h, w), dtype=np.uint8)
    if len(edges) == 0 or w <= 0 or h <= 0:
        return out
    lib.fill_edges(
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(edges),
        int(w),
        int(h),
        0 if fill_rule == "nonzero" else 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
