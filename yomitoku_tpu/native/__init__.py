"""Native (C++) components, built on demand with g++ and bound via ctypes.

Components:
  * rasterizer.cpp — anti-aliased path rasterizer for the built-in PDF
    renderer (the reference's equivalent lives in pdfium C++);
  * dbnet_post.cpp — DBNet probability-map postprocessing: run-length
    connected components, rotating-calipers min-area rects, analytic
    unclip (the reference's equivalents live in OpenCV + pyclipper C++);
  * ccitt.cpp — CCITT Group 3/4 fax decoder for scanned PDFs;
  * jbig2.cpp — JBIG2 (T.88) decoder for the PDF JBIG2Decode filter
    (generic + symbol/text regions, MQ arithmetic coding, MMR).
"""

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIBS = {}


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


def _load_lib(stem: str) -> ctypes.CDLL:
    if stem in _LIBS:
        return _LIBS[stem]
    src = _HERE / f"{stem}.cpp"
    out = _build_dir() / f"lib{stem}.so"
    if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
        out.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(str(out))
    _LIBS[stem] = lib
    return lib


def _load():
    lib = _load_lib("rasterizer")
    if not getattr(lib, "_sig_done", False):
        lib.fill_edges.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.fill_edges.restype = None
        lib._sig_done = True
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


def _load_dbnet_post():
    lib = _load_lib("dbnet_post")
    if not getattr(lib, "_sig_done", False):
        lib.dbnet_boxes.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dbnet_boxes.restype = ctypes.c_int
        lib.dbnet_boxes_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dbnet_boxes_u8.restype = ctypes.c_int
        lib.depth_to_space_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.depth_to_space_u8.restype = None
        lib._sig_done = True
    return lib


def depth_to_space_u8(packed: np.ndarray) -> np.ndarray:
    """(H4, W4, 16) uint8 packed map (slot yo*4+xo = pixel (4i+yo, 4j+xo))
    -> (4*H4, 4*W4) uint8.  Host-side unpack of the TPU's depth-packed
    binarize-head output (interleaved full-res writes are layout-hostile
    on TPU; a 1.2 MB memcpy-speed unpack here is ~10x cheaper than the
    device-side relayout)."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    h4, w4, _ = packed.shape
    out = np.empty((4 * h4, 4 * w4), np.uint8)
    lib = _load_dbnet_post()
    lib.depth_to_space_u8(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(h4), int(w4),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def dbnet_boxes(
    prob: np.ndarray,
    thresh: float,
    box_thresh: float,
    unclip_ratio: float,
    min_size: int,
    max_candidates: int,
    dest_w: int,
    dest_h: int,
):
    """(H, W) probability map -> (quads list[(4,2) int], scores).

    Accepts float32 maps, or uint8 wire maps (value = prob*255) directly —
    the u8 entry point thresholds/scores in the u8 domain, skipping the
    host-side float conversion of the 1+ MB map entirely.

    Native equivalent of DBnetPostProcessor.boxes_from_bitmap (see
    dbnet_post.cpp for the algorithm and its relationship to the
    reference's cv2/pyclipper pipeline)."""
    lib = _load_dbnet_post()
    quads = np.zeros((max_candidates, 4, 2), dtype=np.int16)
    scores = np.zeros((max_candidates,), dtype=np.float32)
    if prob.dtype == np.uint8:
        prob = np.ascontiguousarray(prob)
        h, w = prob.shape
        n = lib.dbnet_boxes_u8(
            prob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(h), int(w),
            float(thresh), float(box_thresh), float(unclip_ratio),
            int(min_size), int(max_candidates),
            int(dest_w), int(dest_h),
            quads.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    else:
        prob = np.ascontiguousarray(prob, dtype=np.float32)
        h, w = prob.shape
        n = lib.dbnet_boxes(
            prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(h), int(w),
            float(thresh), float(box_thresh), float(unclip_ratio),
            int(min_size), int(max_candidates),
            int(dest_w), int(dest_h),
            quads.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    return (
        [q.tolist() for q in quads[:n]],
        [float(s) for s in scores[:n]],
    )


def _load_jbig2():
    lib = _load_lib("jbig2")
    if not getattr(lib, "_sig_done", False):
        lib.jbig2_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.jbig2_decode.restype = ctypes.c_int
        lib.jbig2_last_error.argtypes = []
        lib.jbig2_last_error.restype = ctypes.c_char_p
        lib._sig_done = True
    return lib


def jbig2_decode(data: bytes, width: int, height: int, globals_data: bytes = b"") -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream -> (height, width) uint8, 1 = black.

    ``globals_data`` is the optional /JBIG2Globals stream (shared symbol
    dictionaries).  Raises ValueError with the decoder's message on
    unsupported or corrupt streams.  Native equivalent of the pdfium JBIG2
    decoder the reference uses via pypdfium2 (/root/reference/src/yomitoku/
    data/functions.py:96-155); see native/jbig2.cpp.
    """
    if width <= 0 or height <= 0:
        return np.zeros((max(height, 0), max(width, 0)), np.uint8)
    lib = _load_jbig2()
    buf = np.frombuffer(data, np.uint8)
    gbuf = np.frombuffer(globals_data, np.uint8)
    out = np.zeros((height, width), np.uint8)
    null_u8 = ctypes.POINTER(ctypes.c_uint8)()
    r = lib.jbig2_decode(
        gbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if len(gbuf) else null_u8,
        ctypes.c_long(len(gbuf)),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if len(buf) else null_u8,
        ctypes.c_long(len(buf)),
        int(width),
        int(height),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if r != 0:
        msg = lib.jbig2_last_error()
        raise ValueError(
            "JBIG2 decode failed: %s" % (msg.decode("utf-8", "replace") if msg else "?")
        )
    return out


def _load_ccitt():
    lib = _load_lib("ccitt")
    if not getattr(lib, "_sig_done", False):
        lib.ccitt_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.ccitt_decode.restype = ctypes.c_int
        lib._sig_done = True
    return lib


def ccitt_decode(
    data: bytes, columns: int, rows: int, k: int = -1, byte_align: bool = False
) -> np.ndarray:
    """Decode CCITT Group 3/4 fax data -> (rows, columns) uint8, 1 = black.

    k < 0: Group 4 (T.6 MMR); k == 0: Group 3 1-D (MH); k > 0: Group 3
    mixed.  Rows the bitstream does not cover (truncated / corrupt tails)
    are left white.  Native equivalent of the pdfium fax decoder the
    reference uses via pypdfium2 (/root/reference/src/yomitoku/data/
    functions.py:96-155); see native/ccitt.cpp.
    """
    if rows <= 0 or columns <= 0:
        return np.zeros((max(rows, 0), max(columns, 0)), np.uint8)
    lib = _load_ccitt()
    buf = np.frombuffer(data, np.uint8)
    out = np.zeros((rows, columns), np.uint8)
    r = lib.ccitt_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(len(buf)),
        int(columns),
        int(k),
        1 if byte_align else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(rows),
    )
    if r < rows:
        import logging

        logging.getLogger(__name__).warning(
            "CCITT stream ended after %d of %d rows; remainder left white", r, rows
        )
    return out
