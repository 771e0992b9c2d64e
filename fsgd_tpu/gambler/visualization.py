"""Gambler training/eval visualization.

Parity target — the fork's visualization block (ImbalanceDetection/
train_net.py:42-499): ``prepare_input_images`` / ``prepare_gt_grid`` /
``prepare_loss_grid`` / ``prepare_betting_map`` build normalized per-layer,
per-anchor-scale grids; ``visualize_training_`` writes a gt/loss/weights
triptych per FPN layer plus per-layer/scale weight histograms;
``visualize_per_image`` writes per-image tile sheets; the
``--eval_visualize`` path (fork evaluation/evaluator.py:267-331) renders
betting maps on held-out batches.

Layouts are this framework's NHWC: per-level maps are (B, H, W, A[, K]);
the fork's NCHW make_grid calls become numpy tiling here.  Everything is
host-side numpy — device code never imports this module.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.events import get_event_storage, has_event_storage

logger = logging.getLogger(__name__)

__all__ = [
    "normalize_to_01",
    "make_grid",
    "prepare_input_images",
    "prepare_gt_grid",
    "prepare_loss_grid",
    "prepare_betting_map",
    "visualize_per_image",
    "visualize_training_",
    "visualize_inference",
]


def normalize_to_01(x: np.ndarray) -> np.ndarray:
    """Fork train_net.py:42-46."""
    x = np.asarray(x, np.float32)
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo + 1e-8)


def make_grid(images: List[np.ndarray], ncols: int = 2, pad: int = 1, pad_value: float = 1.0,
              normalize: bool = True) -> np.ndarray:
    """Tile (H, W) or (H, W, 3) arrays into one grid (torchvision
    ``make_grid(nrow=2, pad_value=1)`` analogue, fork :103/:248)."""
    if not images:
        return np.zeros((1, 1), np.float32)
    images = [np.asarray(im, np.float32) for im in images]
    chans = 3 if any(im.ndim == 3 for im in images) else 1
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    norm = []
    for im in images:
        if normalize:
            im = normalize_to_01(im)
        if im.ndim == 2 and chans == 3:
            im = np.tile(im[..., None], (1, 1, 3))
        canvas = np.full((h, w, chans) if chans == 3 else (h, w), pad_value, np.float32)
        canvas[: im.shape[0], : im.shape[1]] = im if chans == 3 else im
        norm.append(canvas)
    ncols = min(ncols, len(norm))
    nrows = (len(norm) + ncols - 1) // ncols
    shape = (nrows * (h + pad), ncols * (w + pad)) + ((chans,) if chans == 3 else ())
    grid = np.full(shape, pad_value, np.float32)
    for i, im in enumerate(norm):
        r, c = divmod(i, ncols)
        grid[r * (h + pad) : r * (h + pad) + h, c * (w + pad) : c * (w + pad) + w] = im
    return grid


def prepare_input_images(images: np.ndarray, denormalizer=None) -> np.ndarray:
    """RGB batch grid in [0, 1] (fork :98-107)."""
    images = np.asarray(images, np.float32)
    if denormalizer is not None:
        images = np.asarray(denormalizer(images))
    images = np.clip(images / 255.0, 0, 1)
    return make_grid([im for im in images], ncols=2, normalize=False)


def prepare_gt_grid(gt_levels: Sequence[np.ndarray], num_classes: int) -> List[List[np.ndarray]]:
    """Gray-coded matched-anchor state per level/scale (fork :81-96, :266-286):
    0.5 = foreground, 1.0 = unmatched (-1), 0.0 = background (num_classes).

    gt_levels: per-level (B, H, W, A) int arrays."""
    out = []
    for gt in gt_levels:
        gt = np.asarray(gt)
        a = np.full(gt.shape, 0.5, np.float32)
        a[gt == -1] = 1.0
        a[gt == num_classes] = 0.0
        out.append([make_grid([img for img in a[..., j]], ncols=2, normalize=False)
                    for j in range(gt.shape[-1])])
    return out


def prepare_loss_grid(loss_levels: Sequence[np.ndarray]) -> List[List[np.ndarray]]:
    """Per-level, per-anchor-scale normalized loss grids (fork :70-79, :226-254).

    loss_levels: per-level (B, H, W, A, K) or (B, H, W, A)."""
    out = []
    for l in loss_levels:
        l = np.asarray(l, np.float32)
        if l.ndim == 5:  # max over classes at each location (fork :237)
            l = l.max(axis=-1)
        l = normalize_to_01(l)
        out.append([make_grid([img for img in l[..., j]], ncols=2, normalize=False)
                    for j in range(l.shape[-1])])
    return out


def _jet(x: np.ndarray) -> np.ndarray:
    """(H, W) in [0,1] -> (H, W, 3) jet colormap (fork :130 plt.get_cmap('jet'))."""
    try:
        import matplotlib.cm as cm

        return cm.get_cmap("jet")(np.clip(x, 0, 1))[..., :3].astype(np.float32)
    except Exception:
        r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
        g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
        return np.stack([r, g, b], axis=-1).astype(np.float32)


def prepare_betting_map(
    betting_levels: Sequence[np.ndarray],
    input_grid: Optional[np.ndarray] = None,
    heatmap_mode: bool = True,
    alpha: float = 0.5,
) -> List[np.ndarray]:
    """Per-level betting-map grids, optionally jet-heatmapped over the input
    (fork :109-141)."""
    import cv2

    out = []
    for b in betting_levels:
        b = np.asarray(b, np.float32)
        if b.ndim == 4:
            b = b.max(axis=-1)  # max over bet channels
        grid = make_grid([img for img in normalize_to_01(b)], ncols=2, normalize=False)
        if heatmap_mode:
            grid = _jet(grid)
            if input_grid is not None:
                resized = cv2.resize(
                    np.asarray(input_grid, np.float32), (grid.shape[1], grid.shape[0])
                )
                if resized.ndim == 2:
                    resized = np.tile(resized[..., None], (1, 1, 3))
                grid = alpha * grid + (1 - alpha) * resized
        out.append(grid)
    return out


def _put_image(storage, key: str, grid: np.ndarray):
    if storage is None:
        return
    img = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.tile(img[..., None], (1, 1, 3))
    storage.put_image(key, img)


def _save_png(grid: np.ndarray, path: str):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _split_gt_levels(gt_classes, n, hs, ws, a) -> List[np.ndarray]:
    """Flattened (B*R,) gt -> per-level (B, H, W, A) host arrays."""
    gt = np.asarray(gt_classes).reshape(n, -1)
    out, offset = [], 0
    for h, w in zip(hs, ws):
        size = h * w * a
        out.append(gt[:, offset : offset + size].reshape(n, h, w, a))
        offset += size
    return out


def visualize_training_(
    gt_classes,
    nakhw_loss: Sequence,
    betting_map: Sequence,
    images,
    num_classes: int,
    storage=None,
    output_dir: Optional[str] = None,
    save_files: bool = False,
    denormalizer=None,
):
    """Batch-level per-layer triptych: gt | loss | weights rows, anchor
    scales concatenated horizontally (fork train_net.py:174-350)."""
    storage = storage or (get_event_storage() if has_event_storage() else None)
    loss_np = [np.asarray(l) for l in nakhw_loss]
    bets_np = [np.asarray(b) for b in betting_map]
    n = loss_np[0].shape[0]
    hs = [l.shape[1] for l in loss_np]
    ws = [l.shape[2] for l in loss_np]
    a = loss_np[0].shape[3]

    gt_levels = _split_gt_levels(gt_classes, n, hs, ws, a)
    gt_grids = prepare_gt_grid(gt_levels, num_classes)
    loss_grids = prepare_loss_grid(loss_np)
    bet_grids = [
        [make_grid([img for img in normalize_to_01(b.max(axis=-1) if b.ndim == 4 and b.shape[-1] != 1 else b[..., 0])],
                   ncols=2, normalize=False)]
        for b in bets_np
    ]

    it = storage.iter if storage is not None else 0
    for layer, (g_scales, l_scales, b_scales) in enumerate(zip(gt_grids, loss_grids, bet_grids)):
        row_gt = np.concatenate(g_scales, axis=1)
        row_loss = np.concatenate(l_scales, axis=1)
        row_bets = np.concatenate(b_scales, axis=1)
        # pad rows to a common width before stacking
        wmax = max(row_gt.shape[1], row_loss.shape[1], row_bets.shape[1])

        def padw(r):
            return np.pad(r, ((0, 0), (0, wmax - r.shape[1])), constant_values=1.0)

        sheet = np.concatenate([padw(row_gt), padw(row_loss), padw(row_bets)], axis=0)
        _put_image(storage, "all/layer{}".format(layer), sheet)
        if save_files and output_dir:
            _save_png(sheet, os.path.join(output_dir, "images", "iter{}_layer{}.png".format(it, layer)))
        if storage is not None:
            b = bets_np[layer]
            for j in range(b.shape[-1] if b.ndim == 4 else 1):
                storage.put_histogram(
                    "weights/layer{}/scale{}".format(layer, j),
                    (b[..., j] if b.ndim == 4 else b).reshape(-1),
                )

    if images is not None:
        input_grid = prepare_input_images(images, denormalizer)
        heat = prepare_betting_map(bets_np, input_grid=input_grid, heatmap_mode=True)
        for layer, hm in enumerate(heat):
            _put_image(storage, "betting_heatmap/layer{}".format(layer), hm)
            if save_files and output_dir:
                _save_png(hm, os.path.join(output_dir, "images", "iter{}_bets_layer{}.png".format(it, layer)))


def visualize_per_image(
    data,
    gt_classes,
    nakhw_loss: Sequence,
    betting_map: Sequence,
    images,
    mask=None,
    storage=None,
    output_dir: Optional[str] = None,
    save_files: bool = False,
    num_classes: int = 80,
    max_images: int = 4,
):
    """Per-image sheets: input + per-layer [gt, loss, bets, mask] tiles in a
    4-wide grid (fork train_net.py:352-498)."""
    storage = storage or (get_event_storage() if has_event_storage() else None)
    loss_np = [np.asarray(l) for l in nakhw_loss]
    bets_np = [np.asarray(b) for b in betting_map]
    n = loss_np[0].shape[0]
    hs = [l.shape[1] for l in loss_np]
    ws = [l.shape[2] for l in loss_np]
    a = loss_np[0].shape[3]
    gt_levels = _split_gt_levels(gt_classes, n, hs, ws, a)
    mask_np = np.asarray(mask).reshape(n, -1) if mask is not None else None

    it = storage.iter if storage is not None else 0
    for i in range(min(n, max_images)):
        for layer in range(len(loss_np)):
            l = loss_np[layer][i]
            if l.ndim == 4:
                l = l.max(axis=-1)
            b = bets_np[layer][i]
            gt = gt_levels[layer][i]
            gt_vis = np.full(gt.shape, 0.5, np.float32)
            gt_vis[gt == -1] = 1.0
            gt_vis[gt == num_classes] = 0.0
            tiles = []
            for j in range(a):
                tiles.extend([gt_vis[..., j], normalize_to_01(l[..., j]),
                              normalize_to_01(b[..., min(j, b.shape[-1] - 1)])])
            sheet = make_grid(tiles, ncols=3, normalize=False)
            key = "iter_{}_img_{}_layer{}".format(it, i, layer)
            _put_image(storage, key, sheet)
            if save_files and output_dir:
                _save_png(sheet, os.path.join(output_dir, "images", key + ".png"))


def visualize_inference(
    detector, gambler, det_params, gam_params, train_loader_iter, cfg, num_batches: int = 4, output_dir=None
):
    """Run detector+gambler forwards on a few batches and dump betting maps
    (fork evaluation/evaluator.py:267-331 --eval_visualize)."""
    import jax.numpy as jnp

    from ..utils.events import EventStorage

    output_dir = output_dir or cfg.OUTPUT_DIR
    num_classes = cfg.MODEL.RETINANET.NUM_CLASSES
    save = cfg.MODEL.GAMBLER_HEAD.SAVE_VIS_FILES
    with EventStorage() as storage:
        for b in range(num_batches):
            batch = next(train_loader_iter)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            images, preds, gt_classes, mask, _ = detector.forward_train(det_params, batch)
            loss_dict, weights, betting_map = gambler.forward(
                gam_params, images, preds["pred_class_logits_levels"], gt_classes, mask, detach_pred=True
            )
            visualize_training_(
                gt_classes, loss_dict["NAKHW_loss"], betting_map, np.asarray(images),
                num_classes, storage, output_dir, save_files=True,
                denormalizer=getattr(detector, "denormalize", None),
            )
            visualize_per_image(
                batch, gt_classes, loss_dict["NAKHW_loss"], betting_map, np.asarray(images),
                mask, storage, output_dir, save_files=save, num_classes=num_classes,
            )
    logger.info("Wrote betting-map visualizations to %s", os.path.join(output_dir, "images"))
