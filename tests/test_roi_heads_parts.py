"""ROI-heads component equivalence tests."""

import jax.numpy as jnp
import numpy as np


class TestCropGtMasksBatched:
    """Separable dense-matmul GT crop == channel-packed roi_align gather
    (fsgd_tpu/models/roi_heads/mask_head.py crop_gt_masks_batched)."""

    def test_matches_roi_align_gather(self):
        from fsgd_tpu.models.roi_heads.mask_head import crop_gt_masks_batched
        from fsgd_tpu.ops.roi_align import roi_align

        rng = np.random.RandomState(0)
        b, g, mh, mw, n, m = 2, 5, 40, 56, 6, 14
        stride = 4.0
        masks = (rng.rand(b, g, mh, mw) > 0.6).astype(np.float32)
        boxes = np.zeros((b, n, 4), np.float32)
        boxes[..., 0] = rng.uniform(0, mw * stride * 0.6, (b, n))
        boxes[..., 1] = rng.uniform(0, mh * stride * 0.6, (b, n))
        boxes[..., 2] = boxes[..., 0] + rng.uniform(8, mw * stride * 0.4, (b, n))
        boxes[..., 3] = boxes[..., 1] + rng.uniform(8, mh * stride * 0.4, (b, n))
        gt_idx = rng.randint(0, g, (b, n))

        got = np.asarray(
            crop_gt_masks_batched(jnp.asarray(masks), jnp.asarray(gt_idx), jnp.asarray(boxes), stride, m)
        )

        # reference: per-roi gather roi_align on the matched mask plane
        feats = masks.reshape(b * g, mh, mw, 1)
        flat_idx = (np.arange(b)[:, None] * g + gt_idx).reshape(b * n)
        rois = np.concatenate([flat_idx[:, None].astype(np.float32), boxes.reshape(b * n, 4)], axis=1)
        want = np.asarray(
            roi_align(jnp.asarray(feats), jnp.asarray(rois), (m, m), 1.0 / stride, 2, True)
        )[..., 0].reshape(b, n, m, m)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
