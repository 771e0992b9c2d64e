"""Gambler tensor-layout helpers.

Parity with ImbalanceDetection/imbalancedetection/gambler_heads.py:34-101
(``N_AK_H_W_to_N_HWA_K``, ``list_N_AK_H_W_to_NsumHWA_K`` and their reverses)
— the fork's most fragile code, specified by its tests/test_reshape.py.

Our tensors are NHWC: a per-level prediction map is (B, H, W, A*K).  The flat
layout is identical to the reference's ((H, W, A) major-to-minor with K
fastest), so losses/weights computed here are element-for-element comparable.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

__all__ = [
    "nhwc_to_N_HWA_K",
    "levels_to_NsumHWA_K",
    "NsumHWA_K_to_level_NHWAK",
    "level_hw_sizes",
]


def nhwc_to_N_HWA_K(tensor: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W, A*K) -> (B, H*W*A, K)."""
    b, h, w, ak = tensor.shape
    return tensor.reshape(b, h * w * (ak // k), k)


def levels_to_NsumHWA_K(tensors: Sequence[jnp.ndarray], k: int) -> jnp.ndarray:
    """list of per-level (B, H, W, A*K) -> (B * sum(HWA), K)
    (reference list_N_AK_H_W_to_NsumHWA_K)."""
    flat = jnp.concatenate([nhwc_to_N_HWA_K(t, k) for t in tensors], axis=1)
    return flat.reshape(-1, k)


def level_hw_sizes(tensors: Sequence[jnp.ndarray]) -> Tuple[List[int], List[int]]:
    return [int(t.shape[1]) for t in tensors], [int(t.shape[2]) for t in tensors]


def NsumHWA_K_to_level_NHWAK(
    flat: jnp.ndarray, n: int, hs: Sequence[int], ws: Sequence[int], a: int, k: int
) -> List[jnp.ndarray]:
    """(B*sumHWA, K) -> list of (B, H, W, A, K) per level
    (reference reverse_list_N_A_K_H_W_to_NsumHWA_K_ modulo NHWC layout)."""
    per_image = flat.reshape(n, -1, k)
    sizes = [h * w * a for h, w in zip(hs, ws)]
    out = []
    start = 0
    for (h, w), size in zip(zip(hs, ws), sizes):
        chunk = per_image[:, start : start + size, :]
        out.append(chunk.reshape(n, h, w, a, k))
        start += size
    return out
