"""COCO run-length-encoding mask codec, in pure numpy.

Replaces pycocotools.mask (not a dependency of this framework): compressed
RLE <-> binary mask, area, bbox, and pairwise mask IoU with the crowd
semantics the evaluator needs.  COCO RLE counts runs of a Fortran-ordered
(column-major) flattened mask starting with zeros; the compressed string is
a base-48 LEB128-style varint encoding with delta compression.
"""

from __future__ import annotations

from typing import Dict, List, Union

import numpy as np

from ..native import load_rle as _load_native_rle

__all__ = [
    "encode",
    "decode",
    "area",
    "to_bbox",
    "rle_iou",
    "mask_to_rle",
    "rle_to_mask",
    "frPyObjects",
]


def _counts_from_mask(mask: np.ndarray) -> List[int]:
    """Binary (H, W) mask -> RLE counts (column-major, starts with 0-run)."""
    flat = np.asarray(mask, dtype=np.uint8).flatten(order="F")
    if flat.size == 0:
        return []
    change = np.nonzero(np.diff(flat))[0] + 1
    runs = np.diff(np.concatenate([[0], change, [flat.size]])).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return [int(r) for r in runs]


def _mask_from_counts(counts: List[int], h: int, w: int) -> np.ndarray:
    n = len(counts)
    vals = (np.arange(n, dtype=np.uint8) & 1).astype(np.uint8)  # 0,1,0,1,...
    flat = np.repeat(vals, np.asarray(counts, dtype=np.int64))
    if flat.size < h * w:  # tolerate short counts (zero-pad like maskApi)
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, np.uint8)])
    return flat[: h * w].reshape((h, w), order="F")


def _compress_counts(counts: List[int]) -> bytes:
    """COCO's LEB128-ish base-48 varint with delta coding for runs >= 3rd."""
    lib = _load_native_rle()
    if lib is not None and counts:
        arr = np.ascontiguousarray(counts, dtype=np.int64)
        cap = 8 * arr.size + 16
        buf = np.zeros(cap, dtype=np.uint8)
        import ctypes

        n = lib.rle_compress(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            arr.size,
            buf.ctypes.data_as(ctypes.c_char_p),
            cap,
        )
        if n >= 0:
            return buf[:n].tobytes()
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            if c & 0x10:
                more = x != -1
            else:
                more = x != 0
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def _decompress_counts(s: Union[bytes, str]) -> List[int]:
    if isinstance(s, str):
        s = s.encode("ascii")
    lib = _load_native_rle()
    if lib is not None and s:
        import ctypes

        cap = len(s) + 4  # every count needs >= 1 byte
        out = np.zeros(cap, dtype=np.int64)
        n = lib.rle_decompress(
            s, len(s), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap
        )
        if n >= 0:
            return out[:n].tolist()
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def encode(mask: np.ndarray) -> Dict:
    """Binary (H, W) mask -> compressed RLE dict {"size", "counts" bytes}."""
    h, w = mask.shape
    return {"size": [int(h), int(w)], "counts": _compress_counts(_counts_from_mask(mask))}


def decode(rle: Dict) -> np.ndarray:
    """RLE dict (compressed or uncompressed counts) -> uint8 (H, W) mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _decompress_counts(counts)
    return _mask_from_counts(list(counts), h, w)


mask_to_rle = encode
rle_to_mask = decode


def _counts_of(rle: Dict) -> List[int]:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        return _decompress_counts(counts)
    return list(counts)


def area(rle: Dict) -> int:
    counts = _counts_of(rle)
    return int(sum(counts[1::2]))


def to_bbox(rle: Dict) -> np.ndarray:
    """RLE -> xywh bbox (like maskUtils.toBbox)."""
    m = decode(rle)
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return np.zeros(4, dtype=np.float64)
    return np.array(
        [xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1], dtype=np.float64
    )


def _rle_intersection_area(a_counts: List[int], b_counts: List[int]) -> int:
    """Intersection of two RLEs without decoding (run merge)."""
    inter = 0
    ia = ib = 0
    ca = a_counts[0] if a_counts else 0
    cb = b_counts[0] if b_counts else 0
    va = vb = 0
    while ia < len(a_counts) and ib < len(b_counts):
        step = min(ca, cb)
        if va and vb:
            inter += step
        ca -= step
        cb -= step
        if ca == 0:
            ia += 1
            if ia < len(a_counts):
                ca = a_counts[ia]
            va ^= 1
        if cb == 0:
            ib += 1
            if ib < len(b_counts):
                cb = b_counts[ib]
            vb ^= 1
    return inter


def rle_iou(dets: List[Dict], gts: List[Dict], iscrowd: List[bool]) -> np.ndarray:
    """Pairwise IoU of det and gt RLEs (crowd gt -> intersection over det area).

    Same contract as maskUtils.iou.
    """
    d = len(dets)
    g = len(gts)
    out = np.zeros((d, g), dtype=np.float64)
    det_counts = [_counts_of(r) for r in dets]
    gt_counts = [_counts_of(r) for r in gts]
    lib = _load_native_rle()
    if lib is not None and d and g:
        import ctypes

        def _flatten(lists):
            offsets = np.zeros(len(lists) + 1, dtype=np.int64)
            np.cumsum([len(c) for c in lists], out=offsets[1:])
            flat = np.ascontiguousarray(
                np.concatenate([np.asarray(c, np.int64) for c in lists])
                if offsets[-1]
                else np.zeros(0, np.int64)
            )
            return flat, offsets

        dflat, doff = _flatten(det_counts)
        gflat, goff = _flatten(gt_counts)
        crowd = np.ascontiguousarray(iscrowd, dtype=np.uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.rle_iou_matrix(
            dflat.ctypes.data_as(i64p), doff.ctypes.data_as(i64p), d,
            gflat.ctypes.data_as(i64p), goff.ctypes.data_as(i64p), g,
            crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out
    det_areas = [sum(c[1::2]) for c in det_counts]
    gt_areas = [sum(c[1::2]) for c in gt_counts]
    for j in range(g):
        for i in range(d):
            inter = _rle_intersection_area(det_counts[i], gt_counts[j])
            if iscrowd[j]:
                denom = det_areas[i]
            else:
                denom = det_areas[i] + gt_areas[j] - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def frPyObjects(pyobj, h: int, w: int):
    """Convert polygon(s)/uncompressed RLE to compressed RLE (subset of
    maskUtils.frPyObjects used by the loaders)."""
    from ..structures.masks import polygons_to_bitmask

    if isinstance(pyobj, dict):
        counts = pyobj["counts"]
        if isinstance(counts, list):
            return {"size": pyobj["size"], "counts": _compress_counts(counts)}
        return pyobj
    if isinstance(pyobj, list) and len(pyobj) and isinstance(pyobj[0], (list, np.ndarray)):
        mask = polygons_to_bitmask([np.asarray(p, np.float64) for p in pyobj], h, w)
        return encode(mask)
    if isinstance(pyobj, list):  # single flat polygon
        mask = polygons_to_bitmask([np.asarray(pyobj, np.float64)], h, w)
        return encode(mask)
    raise TypeError("Unsupported object for frPyObjects: {}".format(type(pyobj)))
