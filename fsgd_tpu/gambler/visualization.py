"""Gambler training/eval visualization.

Role of the fork's visualization block (ImbalanceDetection/train_net.py:42-499:
``visualize_per_image``, ``visualize_training_``, and the ``--eval_visualize``
path through evaluation/evaluator.py:267-331 ``visualize_inference``): render
per-FPN-level grids of the input image, per-anchor loss maps, picky masks and
betting maps into EventStorage images and optional PNG files.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ..utils.events import get_event_storage, has_event_storage

logger = logging.getLogger(__name__)

__all__ = ["visualize_per_image", "visualize_training_", "visualize_inference", "make_grid"]


def make_grid(images: List[np.ndarray], ncols: int = 5, pad: int = 2) -> np.ndarray:
    """Tile equal-size (H, W) float arrays into one grid image (torchvision
    make_grid analogue for single-channel maps)."""
    if not images:
        return np.zeros((1, 1), np.float32)
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    norm = []
    for im in images:
        im = np.asarray(im, np.float32)
        lo, hi = im.min(), im.max()
        im = (im - lo) / (hi - lo + 1e-8)
        canvas = np.zeros((h, w), np.float32)
        canvas[: im.shape[0], : im.shape[1]] = im
        norm.append(canvas)
    ncols = min(ncols, len(norm))
    nrows = (len(norm) + ncols - 1) // ncols
    grid = np.zeros((nrows * (h + pad), ncols * (w + pad)), np.float32)
    for i, im in enumerate(norm):
        r, c = divmod(i, ncols)
        grid[r * (h + pad) : r * (h + pad) + h, c * (w + pad) : c * (w + pad) + w] = im
    return grid


def _level_maps(betting_map: List[np.ndarray], image_idx: int) -> List[np.ndarray]:
    """Per-level (H, W) map: max over the bet channels."""
    return [np.asarray(b[image_idx]).max(axis=-1) for b in betting_map]


def visualize_per_image(
    data, gt_classes, nakhw_loss, weights, images, mask, storage=None, output_dir: Optional[str] = None
):
    """Per-image grids of loss/bets per FPN level (fork train_net.py:352-499)."""
    storage = storage or (get_event_storage() if has_event_storage() else None)
    images = np.asarray(images)
    n = images.shape[0]
    for i in range(min(n, 4)):
        loss_maps = [np.asarray(l[i]).reshape(l.shape[1], l.shape[2], -1).max(axis=-1) for l in nakhw_loss]
        grid = make_grid(loss_maps)
        if storage is not None:
            storage.put_image("gambler/loss_maps_img{}".format(i), (grid * 255).astype(np.uint8)[..., None].repeat(3, -1))
        if output_dir:
            _save_png(grid, os.path.join(output_dir, "images", "loss_img{}_iter{}.png".format(i, storage.iter if storage else 0)))


def visualize_training_(gt_classes, nakhw_loss, weights, images, storage=None, output_dir=None):
    """Batch-level grids (fork train_net.py:174-350)."""
    storage = storage or (get_event_storage() if has_event_storage() else None)
    loss_grid = make_grid(
        [np.asarray(l).max(axis=(0, 3)) if l.ndim == 4 else np.asarray(l).max(axis=0) for l in nakhw_loss]
    )
    if storage is not None:
        storage.put_image("gambler/loss_levels", (loss_grid * 255).astype(np.uint8)[..., None].repeat(3, -1))
        storage.put_histogram("gambler/weights", np.asarray(weights).reshape(-1))


def visualize_inference(detector, gambler, det_params, gam_params, train_loader_iter, cfg, num_batches: int = 4, output_dir=None):
    """Run detector+gambler forwards on a few batches and dump betting maps
    (fork evaluation/evaluator.py:267-331)."""
    import jax.numpy as jnp

    from ..utils.events import EventStorage

    output_dir = output_dir or cfg.OUTPUT_DIR
    with EventStorage() as storage:
        for b in range(num_batches):
            batch = next(train_loader_iter)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            images, preds, gt_classes, mask, _ = detector.forward_train(det_params, batch)
            loss_dict, weights, betting_map = gambler.forward(
                gam_params, images, preds["pred_class_logits_levels"], gt_classes, mask, detach_pred=True
            )
            bets_np = [np.asarray(m) for m in betting_map]
            for i in range(min(bets_np[0].shape[0], 2)):
                grid = make_grid(_level_maps(bets_np, i))
                storage.put_image("eval/betting_maps_b{}_img{}".format(b, i),
                                  (grid * 255).astype(np.uint8)[..., None].repeat(3, -1))
                if output_dir:
                    _save_png(grid, os.path.join(output_dir, "images", "bets_b{}_img{}.png".format(b, i)))
            visualize_per_image(batch, gt_classes, loss_dict["NAKHW_loss"], weights, images, mask, storage, output_dir)
    logger.info("Wrote betting-map visualizations to %s", os.path.join(output_dir, "images"))


def _save_png(grid: np.ndarray, path: str):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(path)
