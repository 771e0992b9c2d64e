"""Rotated-box IoU as vectorized convex-polygon clipping.

TPU-native replacement for the reference's native op
detectron2/layers/csrc/box_iou_rotated/* (box_iou_rotated_utils.h polygon
clipping, 526 LoC C++/CUDA): instead of a per-thread scalar algorithm, every
candidate intersection point of a pair of rotated rectangles is computed in
parallel with validity masks, then the intersection area is a masked shoelace
over angle-sorted candidates.  Fixed shapes throughout (24 candidate points
per pair), so the whole computation vmaps/jits cleanly on the VPU.

Boxes are (cx, cy, w, h, angle_degrees), angle CCW — same parametrization as
the reference detectron2/structures/rotated_boxes.py:12.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pairwise_iou_rotated", "rotated_iou_pair", "rotated_boxes_vertices"]

_EPS = 1e-14


def rotated_boxes_vertices(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) rotated boxes -> (..., 4, 2) corner vertices (counter-clockwise)."""
    cx, cy, w, h, a = [boxes[..., i] for i in range(5)]
    theta = a * (jnp.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx, dy = w * 0.5, h * 0.5
    # corners in box frame, CCW order
    corners_x = jnp.stack([dx, -dx, -dx, dx], axis=-1)  # (..., 4)
    corners_y = jnp.stack([dy, dy, -dy, -dy], axis=-1)
    x = cx[..., None] + c[..., None] * corners_x - s[..., None] * corners_y
    y = cy[..., None] + s[..., None] * corners_x + c[..., None] * corners_y
    return jnp.stack([x, y], axis=-1)


def _points_in_rect(pts: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """pts (P, 2) inside the convex quad verts (4, 2) (CCW) -> (P,) bool."""
    a = verts  # (4, 2)
    b = jnp.roll(verts, -1, axis=0)  # next vertex
    edge = b - a  # (4, 2)
    rel = pts[:, None, :] - a[None, :, :]  # (P, 4, 2)
    cross = edge[None, :, 0] * rel[..., 1] - edge[None, :, 1] * rel[..., 0]
    return jnp.all(cross >= -1e-6, axis=-1)


def _edge_intersections(v1: jnp.ndarray, v2: jnp.ndarray):
    """All 16 segment-segment intersections between two quads.

    Returns points (16, 2) and validity (16,).
    """
    p = v1  # (4, 2)
    r = jnp.roll(v1, -1, axis=0) - v1  # (4, 2) edge vectors
    q = v2
    s = jnp.roll(v2, -1, axis=0) - v2

    # pairwise: p_i + t r_i = q_j + u s_j
    rxs = r[:, None, 0] * s[None, :, 1] - r[:, None, 1] * s[None, :, 0]  # (4, 4)
    qp = q[None, :, :] - p[:, None, :]  # (4, 4, 2)
    qpxs = qp[..., 0] * s[None, :, 1] - qp[..., 1] * s[None, :, 0]
    qpxr = qp[..., 0] * r[:, None, 1] - qp[..., 1] * r[:, None, 0]
    denom = jnp.where(jnp.abs(rxs) < _EPS, 1.0, rxs)
    t = qpxs / denom
    u = qpxr / denom
    valid = (jnp.abs(rxs) >= _EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p[:, None, :] + t[..., None] * r[:, None, :]  # (4, 4, 2)
    return pts.reshape(16, 2), valid.reshape(16)


def _convex_area_from_candidates(pts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Area of the convex hull of masked candidate points (24, 2)."""
    num_valid = jnp.sum(valid)
    vf = valid.astype(pts.dtype)[:, None]
    centroid = jnp.sum(pts * vf, axis=0) / jnp.maximum(jnp.sum(vf), 1.0)
    rel = pts - centroid
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid points sort last
    order = jnp.argsort(ang)
    rel_sorted = rel[order]

    # shoelace over the first num_valid sorted points, wrapping to index 0
    n = pts.shape[0]
    idx = jnp.arange(n)
    nxt = jnp.where(idx + 1 >= num_valid, 0, idx + 1)
    nxt_pts = rel_sorted[nxt]
    cross = rel_sorted[:, 0] * nxt_pts[:, 1] - rel_sorted[:, 1] * nxt_pts[:, 0]
    cross = jnp.where(idx < num_valid, cross, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(cross))
    return jnp.where(num_valid >= 3, area, 0.0)


def rotated_iou_pair(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """IoU of two single rotated boxes, each of shape (5,)."""
    v1 = rotated_boxes_vertices(box1)
    v2 = rotated_boxes_vertices(box2)
    inter_pts, inter_valid = _edge_intersections(v1, v2)
    in12 = _points_in_rect(v1, v2)  # v1 corners inside box2
    in21 = _points_in_rect(v2, v1)
    pts = jnp.concatenate([inter_pts, v1, v2], axis=0)  # (24, 2)
    valid = jnp.concatenate([inter_valid, in12, in21], axis=0)
    inter_area = _convex_area_from_candidates(pts, valid)
    area1 = box1[2] * box1[3]
    area2 = box2[2] * box2[3]
    union = area1 + area2 - inter_area
    return jnp.where(union > 0, inter_area / jnp.where(union > 0, union, 1.0), 0.0)


_pair_grid = jax.vmap(jax.vmap(rotated_iou_pair, in_axes=(None, 0)), in_axes=(0, None))


def pairwise_iou_rotated(boxes1, boxes2, chunk_size: int = 4096) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) IoU matrix.

    Memory is bounded by processing boxes1 in chunks of ``chunk_size`` rows
    (24 candidate points per pair dominate the footprint).
    """
    b1 = boxes1.tensor if hasattr(boxes1, "tensor") else jnp.asarray(boxes1, jnp.float32)
    b2 = boxes2.tensor if hasattr(boxes2, "tensor") else jnp.asarray(boxes2, jnp.float32)
    n, m = b1.shape[0], b2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), dtype=jnp.float32)
    if n <= chunk_size:
        return _pair_grid(b1, b2)
    chunks = [
        _pair_grid(b1[i : i + chunk_size], b2) for i in range(0, n, chunk_size)
    ]
    return jnp.concatenate(chunks, axis=0)
