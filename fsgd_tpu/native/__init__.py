"""Native (C++) host-runtime components, built on demand.

The reference framework ships C/CUDA for its host-side hot loops (pycocotools'
maskApi.c under the evaluators, detectron2/layers/csrc for ops).  The TPU
compute path here is pure JAX/Pallas, but the *host* runtime keeps the same
split: RLE codec loops (varint compress/decompress, run-merge IoU) live in
``rle.cc`` and are compiled once with g++ into a cached ``.so`` loaded via
ctypes.  Everything degrades gracefully: if no toolchain is available (or
``FSGD_NATIVE=0``), callers fall back to the pure-numpy implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_rle_lib = None
_rle_tried = False


def _build(src_path: str, tag: str) -> Optional[str]:
    """Compile src to a cached shared object; return its path or None."""
    with open(src_path, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:12]
    cache_dir = os.environ.get(
        "FSGD_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "fsgd_tpu", "native"),
    )
    so_path = os.path.join(cache_dir, "{}-{}.so".format(tag, digest))
    if os.path.exists(so_path):
        return so_path
    os.makedirs(cache_dir, exist_ok=True)
    tmp = tempfile.mktemp(suffix=".so", dir=cache_dir)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src_path, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        return None
    os.replace(tmp, so_path)  # atomic: concurrent builders race benignly
    return so_path


def load_rle() -> Optional[ctypes.CDLL]:
    """The RLE codec library, or None when native is unavailable/disabled."""
    global _rle_lib, _rle_tried
    if _rle_tried:
        return _rle_lib
    _rle_tried = True
    if os.environ.get("FSGD_NATIVE", "1") == "0":
        return None
    so = _build(os.path.join(_DIR, "rle.cc"), "rle")
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rle_compress.restype = ctypes.c_int64
    lib.rle_compress.argtypes = [i64p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    lib.rle_decompress.restype = ctypes.c_int64
    lib.rle_decompress.argtypes = [ctypes.c_char_p, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.rle_iou_matrix.restype = None
    lib.rle_iou_matrix.argtypes = [
        i64p, i64p, ctypes.c_int64,
        i64p, i64p, ctypes.c_int64,
        u8p, ctypes.POINTER(ctypes.c_double),
    ]
    _rle_lib = lib
    return _rle_lib
