"""Packed-pyramid windowed-matmul ROIAlign must match the exact gather path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsgd_tpu.models.poolers import ROIPooler
from fsgd_tpu.ops.roi_align import roi_align
from fsgd_tpu.ops.roi_align_packed import roi_align_packed


def _rand_pyramid(rng, b=2, c=8, sizes=((32, 48), (16, 24), (8, 12), (4, 6))):
    return [jnp.asarray(rng.rand(b, h, w, c).astype(np.float32)) for h, w in sizes]


class TestPackedROIAlign:
    def test_matches_gather_single_level(self):
        rng = np.random.RandomState(0)
        feats = _rand_pyramid(rng)[:1]
        b, p = 2, 16
        boxes = np.zeros((b, p, 4), np.float32)
        boxes[..., 0:2] = rng.rand(b, p, 2) * 60
        boxes[..., 2:4] = boxes[..., 0:2] + rng.rand(b, p, 2) * 40 + 4
        levels = np.zeros((b, p), np.int32)

        out_packed = roi_align_packed(
            tuple(feats), jnp.asarray(boxes), jnp.asarray(levels), (4,), (7, 7), grid=2, window=48
        )
        # reference: exact gather path at the same (fixed) sampling grid
        rois = np.concatenate(
            [np.repeat(np.arange(b), p)[:, None].astype(np.float32), boxes.reshape(-1, 4)], axis=1
        )
        out_gather = roi_align(feats[0], jnp.asarray(rois), (7, 7), 0.25, 2, True)
        np.testing.assert_allclose(
            np.asarray(out_packed).reshape(-1, 7, 7, 8), np.asarray(out_gather), atol=2e-4
        )

    def test_matches_gather_multi_level(self):
        rng = np.random.RandomState(1)
        feats = _rand_pyramid(rng)
        strides = (4, 8, 16, 32)
        b, p = 2, 32
        boxes = np.zeros((b, p, 4), np.float32)
        boxes[..., 0:2] = rng.rand(b, p, 2) * 50
        sizes = rng.rand(b, p, 2) * 100 + 8
        boxes[..., 2:4] = boxes[..., 0:2] + sizes

        from fsgd_tpu.ops.roi_align_packed import pack_feature_pyramid  # noqa: F401
        from fsgd_tpu.models.poolers import assign_boxes_to_levels

        levels = np.asarray(
            assign_boxes_to_levels(jnp.asarray(boxes.reshape(-1, 4)), 2, 5, 224, 4)
        ).reshape(b, p) - 2

        out_packed = np.asarray(
            roi_align_packed(
                tuple(feats), jnp.asarray(boxes), jnp.asarray(levels), strides, (7, 7), grid=2, window=48
            )
        )
        # per-roi exact gather at the assigned level
        for i in range(b):
            for j in range(0, p, 5):
                lvl = int(levels[i, j])
                roi = np.concatenate([[i], boxes[i, j]]).astype(np.float32)[None]
                ref = np.asarray(
                    roi_align(feats[lvl], jnp.asarray(roi), (7, 7), 1.0 / strides[lvl], 2, True)
                )[0]
                np.testing.assert_allclose(out_packed[i, j], ref, atol=2e-4)

    @pytest.mark.slow
    def test_pooler_uses_packed(self):
        rng = np.random.RandomState(2)
        feats = _rand_pyramid(rng)
        pooler = ROIPooler(7, [1 / 4, 1 / 8, 1 / 16, 1 / 32], 2, "ROIAlignV2")
        assert pooler.use_packed
        b, p = 2, 10
        boxes = np.zeros((b, p, 4), np.float32)
        boxes[..., 0:2] = rng.rand(b, p, 2) * 40
        boxes[..., 2:4] = boxes[..., 0:2] + rng.rand(b, p, 2) * 60 + 4
        out = pooler(feats, jnp.asarray(boxes))
        assert out.shape == (b, p, 7, 7, 8)

        pooler.use_packed = False
        out_ref = pooler(feats, jnp.asarray(boxes))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-4)

    def test_grad_flows(self):
        rng = np.random.RandomState(3)
        feats = _rand_pyramid(rng, b=1)
        boxes = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
        levels = jnp.zeros((1, 1), jnp.int32)

        def f(f0):
            out = roi_align_packed((f0, *feats[1:]), boxes, levels, (4, 8, 16, 32), (7, 7), grid=2, window=48)
            return jnp.sum(out ** 2)

        g = jax.grad(f)(feats[0])
        assert float(jnp.abs(g).max()) > 0
