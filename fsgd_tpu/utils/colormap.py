"""Color map for visualization (role of detectron2/utils/colormap.py).

Generates a deterministic set of visually-distinct RGB colors via
golden-ratio hue stepping (values in [0, 1] by default).
"""

from __future__ import annotations

import colorsys

import numpy as np

__all__ = ["colormap", "random_color"]

_GOLDEN_RATIO_CONJ = 0.61803398875


def colormap(rgb: bool = True, maximum: float = 1.0, n: int = 79) -> np.ndarray:
    """(N, 3) distinct colors."""
    colors = []
    h = 0.0
    for i in range(n):
        h = (h + _GOLDEN_RATIO_CONJ) % 1.0
        s = 0.65 + 0.2 * ((i // 3) % 2)
        v = 0.85 - 0.15 * ((i // 5) % 2)
        colors.append(colorsys.hsv_to_rgb(h, s, v))
    out = np.array(colors, dtype=np.float64) * maximum
    if not rgb:
        out = out[:, ::-1]
    return out


def random_color(rgb: bool = True, maximum: float = 1.0) -> np.ndarray:
    cmap = colormap(rgb=rgb, maximum=maximum)
    return cmap[np.random.randint(len(cmap))]
