"""Gambler visualization grid suite (fork ImbalanceDetection/train_net.py:42-499)."""

import numpy as np

from fsgd_tpu.gambler.visualization import (
    make_grid,
    normalize_to_01,
    prepare_betting_map,
    prepare_gt_grid,
    prepare_input_images,
    prepare_loss_grid,
    visualize_per_image,
    visualize_training_,
)
from fsgd_tpu.utils.events import EventStorage


def _levels(n=2, a=3, k=4, sizes=((16, 16), (8, 8))):
    rng = np.random.RandomState(0)
    loss = [rng.rand(n, h, w, a, k).astype(np.float32) for h, w in sizes]
    bets = [rng.rand(n, h, w, a).astype(np.float32) for h, w in sizes]
    r = sum(h * w * a for h, w in sizes)
    gt = rng.randint(-1, k + 1, (n * r,)).astype(np.int32)
    images = rng.rand(n, 64, 64, 3).astype(np.float32) * 255
    return loss, bets, gt, images


def test_make_grid_shapes():
    g = make_grid([np.zeros((8, 8)), np.ones((8, 8)), np.ones((8, 8))], ncols=2)
    assert g.shape == (18, 18)
    g3 = make_grid([np.zeros((8, 8, 3)), np.ones((8, 8))], ncols=2)
    assert g3.shape[-1] == 3


def test_prepare_grids():
    loss, bets, gt, images = _levels()
    lg = prepare_loss_grid(loss)
    assert len(lg) == 2 and len(lg[0]) == 3  # per level, per anchor scale
    n, a = 2, 3
    gt_levels = [gt[: 2 * 16 * 16 * 3].reshape(2, 16, 16, 3)]
    gg = prepare_gt_grid(gt_levels, num_classes=4)
    assert set(np.unique(gg[0][0])) <= {0.0, 0.5, 1.0}
    ig = prepare_input_images(images)
    assert ig.ndim == 3 and ig.shape[-1] == 3
    heat = prepare_betting_map(bets, input_grid=ig, heatmap_mode=True)
    assert len(heat) == 2 and heat[0].shape[-1] == 3


def test_visualize_training_writes_storage():
    loss, bets, gt, images = _levels()
    with EventStorage() as storage:
        visualize_training_(gt, loss, bets, images, num_classes=4, storage=storage)
        # one triptych sheet per layer + heatmaps + histograms
        assert len(storage._vis_images) >= 2
        assert any(t[0].startswith("weights/layer") for t in storage._histograms)


def test_visualize_per_image_writes_storage(tmp_path):
    loss, bets, gt, images = _levels()
    with EventStorage() as storage:
        visualize_per_image(
            None, gt, loss, bets, images, storage=storage,
            output_dir=str(tmp_path), save_files=True, num_classes=4, max_images=1,
        )
        assert len(storage._vis_images) >= 2
    import os

    assert os.path.isdir(str(tmp_path / "images"))
