"""Op tests: ROIAlign goldens (ported from reference tests/test_roi_align.py),
NMS vs brute-force greedy, matcher semantics, box transforms, sampling, losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsgd_tpu.ops import (
    Box2BoxTransform,
    Box2BoxTransformRotated,
    Matcher,
    batched_nms,
    nms,
    nms_mask,
    nms_topk,
    nms_rotated,
    roi_align,
    roi_align_rotated,
    sigmoid_focal_loss,
    smooth_l1_loss,
    subsample_labels,
)


def _simple_roialign(img, box, resolution, aligned=True):
    """Scale 1.0, sampling_ratio 0 — mirrors reference test helper."""
    if isinstance(resolution, int):
        resolution = (resolution, resolution)
    feat = jnp.asarray(img, jnp.float32)[None, :, :, None]  # NHWC
    rois = jnp.asarray([[0] + list(box)], jnp.float32)
    out = roi_align(feat, rois, resolution, 1.0, 0, aligned)
    return np.asarray(out[0, :, :, 0])


class TestROIAlign:
    def test_forward_output_golden(self):
        """Exact expected grids from reference tests/test_roi_align.py:11-48."""
        inp = np.arange(25).reshape(5, 5).astype("float32")
        output = _simple_roialign(inp, [1, 1, 3, 3], (4, 4), aligned=False)
        output_correct = _simple_roialign(inp, [1, 1, 3, 3], (4, 4), aligned=True)
        old_results = [
            [7.5, 8, 8.5, 9],
            [10, 10.5, 11, 11.5],
            [12.5, 13, 13.5, 14],
            [15, 15.5, 16, 16.5],
        ]
        correct_results = [
            [4.5, 5.0, 5.5, 6.0],
            [7.0, 7.5, 8.0, 8.5],
            [9.5, 10.0, 10.5, 11.0],
            [12.0, 12.5, 13.0, 13.5],
        ]
        np.testing.assert_allclose(output, old_results, atol=1e-5)
        np.testing.assert_allclose(output_correct, correct_results, atol=1e-5)

    def test_resize_consistency(self):
        import cv2

        H, W = 30, 30
        rng = np.random.RandomState(3)
        inp = rng.rand(H, W).astype("float32") * 100
        box = [10, 10, 20, 20]
        output = _simple_roialign(inp, box, (5, 5), aligned=True)
        inp2x = cv2.resize(inp, (W // 2, H // 2), interpolation=cv2.INTER_LINEAR)
        box2x = [x / 2 for x in box]
        output2x = _simple_roialign(inp2x, box2x, (5, 5), aligned=True)
        assert np.abs(output2x - output).max() < 1e-4

    def test_empty_box(self):
        img = np.random.rand(5, 5).astype(np.float32)
        o = _simple_roialign(img, [3, 4, 5, 4], 7)
        assert (o == 0).all()

    def test_batch_index_and_channels(self):
        rng = np.random.RandomState(0)
        feats = rng.rand(2, 8, 8, 3).astype(np.float32)
        rois = np.array([[1, 0, 0, 8, 8]], np.float32)
        out = roi_align(jnp.asarray(feats), jnp.asarray(rois), (2, 2), 1.0, 2, True)
        assert out.shape == (1, 2, 2, 3)
        # sampling only touches image 1
        out0 = roi_align(jnp.asarray(feats[1:2]), jnp.asarray([[0, 0, 0, 8, 8]], np.float32), (2, 2), 1.0, 2, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out0), atol=1e-6)

    def test_roi_chunking(self):
        rng = np.random.RandomState(1)
        feats = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
        rois = np.zeros((300, 5), np.float32)
        rois[:, 1:3] = rng.rand(300, 2) * 8
        rois[:, 3:5] = rois[:, 1:3] + rng.rand(300, 2) * 7 + 1
        rois_j = jnp.asarray(rois)
        out_chunked = roi_align(feats, rois_j, (7, 7), 0.5, 2, True, roi_chunk=128)
        out_whole = roi_align(feats, rois_j, (7, 7), 0.5, 2, True, roi_chunk=512)
        np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out_whole), atol=1e-5)


class TestROIAlignRotated:
    def test_angle0_matches_roialign(self):
        """Reference tests/test_roi_align_rotated.py:30-70: at angle 0 the
        rotated op equals aligned ROIAlign on the equivalent xyxy box."""
        rng = np.random.RandomState(2)
        feats = jnp.asarray(rng.rand(1, 10, 10, 2).astype(np.float32))
        # xyxy box (2, 3) -> (8, 7): center (5, 5), size (6, 4)
        out_ref = roi_align(feats, jnp.asarray([[0, 2, 3, 8, 7]], np.float32), (4, 4), 1.0, 2, True)
        rot_rois = jnp.asarray([[0, 5, 5, 6, 4, 0]], np.float32)
        out_rot = roi_align_rotated(feats, rot_rois, (4, 4), 1.0, 2)
        np.testing.assert_allclose(np.asarray(out_rot), np.asarray(out_ref), atol=1e-5)

    def test_90deg_rotation(self):
        """90-degree rotation equals transposing the sampled patch (reference
        test_roi_align_rotated.py:71-128 equivalence family)."""
        rng = np.random.RandomState(4)
        feats = jnp.asarray(rng.rand(1, 12, 12, 1).astype(np.float32))
        base = roi_align_rotated(feats, jnp.asarray([[0, 6, 6, 4, 4, 0]], np.float32), (3, 3), 1.0, 2)
        rot90 = roi_align_rotated(feats, jnp.asarray([[0, 6, 6, 4, 4, 90]], np.float32), (3, 3), 1.0, 2)
        # rotating the roi by 90 CCW: output is the base patch rotated
        a = np.asarray(base[0, :, :, 0])
        b = np.asarray(rot90[0, :, :, 0])
        np.testing.assert_allclose(b, np.rot90(a, k=-1), atol=1e-4)


def _greedy_nms_reference(boxes, scores, thresh):
    """Brute-force sequential greedy NMS in numpy."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        union = area_i + areas - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0)
        suppressed |= iou > thresh
        suppressed[i] = False  # keep itself marked un-suppressed? it's already kept
    return np.array(sorted(keep, key=lambda k: (-scores[k], k)))


class TestNMS:
    @pytest.mark.slow
    def test_matches_greedy_random(self):
        rng = np.random.RandomState(0)
        for trial in range(5):
            n = 200
            ctr = rng.rand(n, 2) * 50
            wh = rng.rand(n, 2) * 20 + 1
            boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)
            scores = rng.rand(n).astype(np.float32)
            expected = _greedy_nms_reference(boxes, scores, 0.5)
            got = nms(boxes, scores, 0.5)
            np.testing.assert_array_equal(np.sort(got), np.sort(expected))
            # order: descending score
            assert (np.diff(scores[got]) <= 1e-7).all()

    @pytest.mark.slow
    def test_valid_mask_excludes_padding(self):
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 0, 0]], np.float32)
        scores = np.array([0.9, 0.8, 100.0], np.float32)  # padded entry has bogus high score
        valid = jnp.array([True, True, False])
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, valid))
        np.testing.assert_array_equal(keep, [True, False, False])

    def test_nms_topk_static(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
        scores = np.array([0.9, 0.95, 0.5], np.float32)
        idx, mask = nms_topk(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
        assert idx.shape == (5,) and mask.shape == (5,)
        kept = np.asarray(idx)[np.asarray(mask)]
        np.testing.assert_array_equal(kept, [1, 2])  # box 0 suppressed by higher-scored box 1

    @pytest.mark.slow
    def test_batched_nms_classes_independent(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        same_class = batched_nms(boxes, scores, np.array([0, 0]), 0.5)
        diff_class = batched_nms(boxes, scores, np.array([0, 1]), 0.5)
        assert len(same_class) == 1
        assert len(diff_class) == 2

    @pytest.mark.slow
    def test_nms_rotated_angle0_matches_nms(self):
        """Reference tests/test_nms_rotated.py:45-155: rotated NMS at angle 0
        must match horizontal NMS."""
        rng = np.random.RandomState(7)
        n = 100
        ctr = rng.rand(n, 2) * 40
        wh = rng.rand(n, 2) * 15 + 2
        xyxy = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)
        rot = np.concatenate([ctr, wh, np.zeros((n, 1))], axis=1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        keep_h = nms(xyxy, scores, 0.5)
        keep_r = nms_rotated(rot, scores, 0.5)
        np.testing.assert_array_equal(keep_h, keep_r)


class TestMatcher:
    def test_buckets_and_low_quality(self):
        """Mirrors reference matcher semantics (modeling/matcher.py:5-133)."""
        matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
        # 2 gt x 5 predictions
        quality = jnp.asarray(
            [
                [0.9, 0.8, 0.25, 0.4, 0.0],
                [0.0, 0.1, 0.35, 0.5, 0.05],
            ]
        )
        matches, labels = matcher(quality)
        np.testing.assert_array_equal(np.asarray(matches), [0, 0, 1, 1, 1])
        # pred0: 0.9 -> 1; pred1: 0.8 -> 1 (also not gt-max but >=0.7)
        # pred2: 0.35 -> ignore (-1); pred3: 0.5 -> ignore but NOT rescued (not max for gt1? 0.5 IS max for gt1 -> rescued 1)
        # pred4: 0.05 -> 0
        np.testing.assert_array_equal(np.asarray(labels), [1, 1, -1, 1, 0])

    def test_no_low_quality(self):
        matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=False)
        quality = jnp.asarray([[0.5, 0.2]])
        _, labels = matcher(quality)
        np.testing.assert_array_equal(np.asarray(labels), [-1, 0])

    def test_empty_gt_padded(self):
        matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
        quality = jnp.zeros((3, 4))
        gt_valid = jnp.zeros((3,), bool)
        matches, labels = matcher(quality, gt_valid)
        np.testing.assert_array_equal(np.asarray(labels), [0, 0, 0, 0])

    def test_single_threshold(self):
        matcher = Matcher([0.5], [0, 1], allow_low_quality_matches=False)
        quality = jnp.asarray([[0.6, 0.4]])
        _, labels = matcher(quality)
        np.testing.assert_array_equal(np.asarray(labels), [1, 0])

    def test_streamed_matches_dense(self):
        """match_streamed must equal the dense path bit-for-bit (incl. the
        equality-based low-quality rescue) on random boxes, padded GT, empty
        GT, and a chunk size that forces tail padding.

        Boxes live on an integer grid so every IoU numerator/denominator is
        an exactly-representable fp32 integer: XLA may fuse FMAs differently
        for the (M, N) dense shape vs the (M, chunk) scan body, but exact
        products/sums leave no last-ulp slack for that to show (guaranteeing
        plenty of true ties for the rescue path, too)."""
        from fsgd_tpu.structures import pairwise_iou

        rng = np.random.RandomState(7)
        n, m = 203, 6  # 203 deliberately not a multiple of chunk=64

        def rand_boxes(k):
            ctr = rng.randint(0, 80, size=(k, 2)).astype(np.float32)
            wh = rng.randint(1, 40, size=(k, 2)).astype(np.float32)
            return np.concatenate([ctr - wh, ctr + wh], axis=1)

        anchors = jnp.asarray(rand_boxes(n))
        for valid_count in [m, 3, 0]:
            gt = jnp.asarray(rand_boxes(m))
            gt_valid = jnp.arange(m) < valid_count
            for low_quality in [True, False]:
                matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=low_quality)
                dense_q = pairwise_iou(gt, anchors)
                d_matches, d_labels = matcher(dense_q, gt_valid)
                s_matches, s_labels, s_vals = matcher.match_streamed(
                    gt, gt_valid, anchors, pairwise_iou, chunk=64
                )
                np.testing.assert_array_equal(np.asarray(d_matches), np.asarray(s_matches))
                np.testing.assert_array_equal(np.asarray(d_labels), np.asarray(s_labels))
                masked = jnp.where(gt_valid[:, None], dense_q, -1.0)
                np.testing.assert_array_equal(
                    np.asarray(jnp.max(masked, axis=0)), np.asarray(s_vals)
                )


class TestBox2BoxTransform:
    def test_reconstruction(self):
        """Encode->decode must reconstruct targets (reference test_box2box_transform.py:16)."""
        rng = np.random.RandomState(5)
        for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
            t = Box2BoxTransform(weights)
            src = rng.rand(10, 4) * 50
            src[:, 2:] += src[:, :2] + 1
            tgt = rng.rand(10, 4) * 50
            tgt[:, 2:] += tgt[:, :2] + 1
            deltas = t.get_deltas(jnp.asarray(src, jnp.float32), jnp.asarray(tgt, jnp.float32))
            rec = t.apply_deltas(deltas, jnp.asarray(src, jnp.float32))
            np.testing.assert_allclose(np.asarray(rec), tgt, atol=5e-3)

    def test_multiclass_deltas(self):
        t = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
        boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        deltas = jnp.zeros((1, 8), jnp.float32)  # 2 classes
        out = t.apply_deltas(deltas, boxes)
        assert out.shape == (1, 8)
        np.testing.assert_allclose(np.asarray(out), [[0, 0, 10, 10, 0, 0, 10, 10]], atol=1e-5)

    def test_rotated_reconstruction(self):
        rng = np.random.RandomState(6)
        t = Box2BoxTransformRotated((1.0, 1.0, 1.0, 1.0, 1.0))
        src = np.concatenate([rng.rand(8, 2) * 50, rng.rand(8, 2) * 20 + 2, rng.rand(8, 1) * 90 - 45], axis=1)
        tgt = np.concatenate([rng.rand(8, 2) * 50, rng.rand(8, 2) * 20 + 2, rng.rand(8, 1) * 90 - 45], axis=1)
        deltas = t.get_deltas(jnp.asarray(src, jnp.float32), jnp.asarray(tgt, jnp.float32))
        rec = np.asarray(t.apply_deltas(deltas, jnp.asarray(src, jnp.float32)))
        np.testing.assert_allclose(rec, tgt, atol=5e-3)


class TestSampling:
    def test_subsample_counts(self):
        labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 5)
        pos_idx, pos_valid, neg_idx, neg_valid = subsample_labels(
            labels, 64, 0.5, 0, jax.random.PRNGKey(0)
        )
        assert int(pos_valid.sum()) == 10  # only 10 positives available
        assert int(neg_valid.sum()) == 54  # fill the rest
        assert np.all(np.asarray(labels)[np.asarray(pos_idx)[np.asarray(pos_valid)]] == 1)
        assert np.all(np.asarray(labels)[np.asarray(neg_idx)[np.asarray(neg_valid)]] == 0)

    def test_subsample_caps_positives(self):
        labels = jnp.asarray([1] * 100 + [0] * 100)
        _, pos_valid, _, neg_valid = subsample_labels(labels, 64, 0.25, 0, jax.random.PRNGKey(1))
        assert int(pos_valid.sum()) == 16
        assert int(neg_valid.sum()) == 48

    def test_randomness(self):
        labels = jnp.asarray([1] * 50 + [0] * 50)
        a = subsample_labels(labels, 8, 0.5, 0, jax.random.PRNGKey(0))[0]
        b = subsample_labels(labels, 8, 0.5, 0, jax.random.PRNGKey(1))[0]
        assert not np.array_equal(np.asarray(a), np.asarray(b))


class TestLosses:
    def test_focal_matches_bce_at_gamma0(self):
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(10, 5).astype(np.float32))
        targets = jnp.asarray((rng.rand(10, 5) > 0.5).astype(np.float32))
        fl = sigmoid_focal_loss(logits, targets, alpha=-1, gamma=0.0)
        # plain BCE
        p = 1 / (1 + np.exp(-np.asarray(logits)))
        bce = -(np.asarray(targets) * np.log(p) + (1 - np.asarray(targets)) * np.log(1 - p))
        np.testing.assert_allclose(np.asarray(fl), bce, atol=1e-4)

    def test_focal_downweights_easy(self):
        easy = sigmoid_focal_loss(jnp.asarray([10.0]), jnp.asarray([1.0]), gamma=2.0)
        hard = sigmoid_focal_loss(jnp.asarray([-10.0]), jnp.asarray([1.0]), gamma=2.0)
        assert float(easy[0]) < 1e-6
        assert float(hard[0]) > 1.0

    def test_smooth_l1(self):
        x = jnp.asarray([0.0, 0.05, 0.5, 2.0])
        t = jnp.zeros(4)
        out = np.asarray(smooth_l1_loss(x, t, beta=0.1))
        np.testing.assert_allclose(out, [0.0, 0.0125, 0.45, 1.95], atol=1e-6)
        out_l1 = np.asarray(smooth_l1_loss(x, t, beta=0.0))
        np.testing.assert_allclose(out_l1, [0, 0.05, 0.5, 2.0], atol=1e-6)


class TestPallasNMS:
    def test_interpret_matches_greedy(self):
        """The Pallas kernel (interpret mode on CPU) is bit-identical to greedy."""
        import jax.numpy as jnp

        from fsgd_tpu.ops.pallas_nms import nms_sorted_pallas

        rng = np.random.RandomState(5)
        n = 150
        ctr = rng.rand(n, 2) * 40
        wh = rng.rand(n, 2) * 15 + 2
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sboxes = boxes[order]
        keep = np.asarray(
            nms_sorted_pallas(jnp.asarray(sboxes), jnp.ones(n, bool), 0.5, interpret=True)
        )
        expected = _greedy_nms_reference(sboxes, scores[order], 0.5)
        ref_mask = np.zeros(n, bool)
        ref_mask[expected] = True
        np.testing.assert_array_equal(keep, ref_mask)


class TestRoIPool:
    """roi_pool vs a direct Caffe2-semantics numpy loop
    (reference pooler type "ROIPool", detectron2 poolers.py:95-100)."""

    @staticmethod
    def _ref_roi_pool(feat, rois, out_size, scale):
        n, h, w, c = feat.shape
        ph, pw = out_size
        out = np.zeros((len(rois), ph, pw, c), np.float32)
        for r, roi in enumerate(rois):
            b = int(roi[0])
            x1 = int(round(roi[1] * scale)); y1 = int(round(roi[2] * scale))
            x2 = int(round(roi[3] * scale)); y2 = int(round(roi[4] * scale))
            rw = max(x2 - x1 + 1, 1); rh = max(y2 - y1 + 1, 1)
            bw, bh = rw / pw, rh / ph
            for i in range(ph):
                for j in range(pw):
                    hs = min(max(int(np.floor(i * bh)) + y1, 0), h)
                    he = min(max(int(np.ceil((i + 1) * bh)) + y1, 0), h)
                    ws = min(max(int(np.floor(j * bw)) + x1, 0), w)
                    we = min(max(int(np.ceil((j + 1) * bw)) + x1, 0), w)
                    if he <= hs or we <= ws:
                        continue
                    out[r, i, j] = feat[b, hs:he, ws:we].reshape(-1, c).max(axis=0)
        return out

    def test_matches_reference_loop(self):
        from fsgd_tpu.ops.roi_pool import roi_pool

        rng = np.random.RandomState(0)
        feat = rng.randn(2, 24, 32, 3).astype(np.float32)
        rois = np.array(
            [
                [0, 4.0, 4.0, 60.0, 44.0],
                [1, 0.0, 0.0, 127.0, 95.0],
                [0, 10.0, 8.0, 30.0, 20.0],
                [1, 50.0, 30.0, 90.0, 80.0],
            ],
            np.float32,
        )
        got = np.asarray(roi_pool(feat, rois, (7, 7), 0.25, grid=8, roi_chunk=4))
        want = self._ref_roi_pool(feat, rois, (7, 7), 0.25)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pooler_type_roipool(self):
        from fsgd_tpu.models.poolers import ROIPooler

        rng = np.random.RandomState(1)
        feats = [rng.randn(2, 32, 32, 4).astype(np.float32), rng.randn(2, 16, 16, 4).astype(np.float32)]
        pooler = ROIPooler((7, 7), [0.25, 0.125], 0, "ROIPool")
        boxes = np.array(
            [[[10.0, 10.0, 60.0, 60.0], [0.0, 0.0, 120.0, 120.0]]] * 2, np.float32
        )
        out = pooler(feats, jnp.asarray(boxes))
        assert out.shape == (2, 2, 7, 7, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestPallasRoiAlign:
    """Pipelined Pallas windowed ROIAlign == XLA gather formulation
    (interpret mode; fsgd_tpu/ops/pallas_roi_align.py)."""

    def test_interpret_matches_xla_windows(self):
        from fsgd_tpu.ops.roi_align_packed import (
            _window_meta,
            _xla_windows,
            pack_feature_pyramid,
        )
        from fsgd_tpu.ops.pallas_roi_align import roi_align_windows_pallas

        rng = np.random.RandomState(0)
        window, ph = 16, 7
        feats = [
            jnp.asarray(rng.randn(2, 32, 40, 8).astype(np.float32)),
            jnp.asarray(rng.randn(2, 16, 20, 8).astype(np.float32)),
        ]
        packed, row_offsets, heights, widths = pack_feature_pyramid(feats, window)
        n = 12
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, 100, n)
        boxes[:, 1] = rng.uniform(0, 80, n)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 40, n)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 40, n)
        levels = jnp.asarray(rng.randint(0, 2, n), jnp.int32)
        batch_idx = jnp.asarray(rng.randint(0, 2, n), jnp.int32)
        starts, wy, wx = _window_meta(
            batch_idx, jnp.asarray(boxes), levels,
            jnp.asarray(row_offsets, jnp.int32), jnp.asarray(heights, jnp.int32),
            jnp.asarray(widths, jnp.int32), jnp.asarray([0.25, 0.125], jnp.float32),
            ph, ph, 2, window, True,
        )
        want = np.asarray(_xla_windows(packed, starts, wy, wx, window, 4))
        got = np.asarray(
            roi_align_windows_pallas(packed, starts, wy, wx, window, ph, True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_interpret_vjp_matches_xla_grad(self):
        from fsgd_tpu.ops.roi_align_packed import (
            _window_meta,
            _xla_windows,
            pack_feature_pyramid,
        )
        from fsgd_tpu.ops.pallas_roi_align import roi_align_windows_pallas

        rng = np.random.RandomState(1)
        window, ph = 16, 7
        feats = [
            jnp.asarray(rng.randn(2, 32, 40, 8).astype(np.float32)),
            jnp.asarray(rng.randn(2, 16, 20, 8).astype(np.float32)),
        ]
        packed, row_offsets, heights, widths = pack_feature_pyramid(feats, window)
        n = 10
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, 100, n)
        boxes[:, 1] = rng.uniform(0, 80, n)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 40, n)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 40, n)
        # duplicate a box so overlapping (conflicting) windows are exercised
        boxes[5] = boxes[4]
        levels = jnp.asarray(rng.randint(0, 2, n), jnp.int32)
        levels = levels.at[5].set(levels[4])
        batch_idx = jnp.asarray(rng.randint(0, 2, n), jnp.int32)
        batch_idx = batch_idx.at[5].set(batch_idx[4])
        starts, wy, wx = _window_meta(
            batch_idx, jnp.asarray(boxes), levels,
            jnp.asarray(row_offsets, jnp.int32), jnp.asarray(heights, jnp.int32),
            jnp.asarray(widths, jnp.int32), jnp.asarray([0.25, 0.125], jnp.float32),
            ph, ph, 2, window, True,
        )

        def loss_pallas(p):
            out = roi_align_windows_pallas(p, starts, wy, wx, window, ph, True)
            return jnp.sum(out * out)

        def loss_xla(p):
            out = _xla_windows(p, starts, wy, wx, window, 4)
            return jnp.sum(out * out)

        g_pallas = jax.grad(loss_pallas)(packed)
        g_xla = jax.grad(loss_xla)(packed)
        np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-4)


class TestPallasRoiAlignBucketed:
    """Bucketed two-pass kernel == XLA gather formulation, fwd + VJP
    (interpret mode; fsgd_tpu/ops/pallas_roi_align.py
    roi_align_windows_bucketed)."""

    def _setup(self, seed=2):
        from fsgd_tpu.ops.roi_align_packed import _window_meta, pack_feature_pyramid

        rng = np.random.RandomState(seed)
        window_l, window_s, ph = 24, 16, 7
        feats = [
            jnp.asarray(rng.randn(2, 32, 40, 8).astype(np.float32)),
            jnp.asarray(rng.randn(2, 16, 20, 8).astype(np.float32)),
        ]
        packed, row_offsets, heights, widths = pack_feature_pyramid(feats, window_l)
        n = 14
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, 100, n)
        boxes[:, 1] = rng.uniform(0, 80, n)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 40, n)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 40, n)
        # a few extreme-aspect boxes land in the large bucket
        boxes[0, 2] = boxes[0, 0] + 120.0
        boxes[7, 3] = boxes[7, 1] + 110.0
        # duplicate for RMW conflict coverage
        boxes[5] = boxes[4]
        levels = rng.randint(0, 2, n)
        levels[0] = 0  # pin the extreme-aspect boxes to the fine level so
        levels[7] = 0  # their spans exceed the small window
        levels[5] = levels[4]
        batch_idx = rng.randint(0, 2, n)
        batch_idx[5] = batch_idx[4]
        levels = jnp.asarray(levels, jnp.int32)
        batch_idx = jnp.asarray(batch_idx, jnp.int32)
        scales = jnp.asarray([0.25, 0.125], jnp.float32)
        args = (batch_idx, jnp.asarray(boxes), levels,
                jnp.asarray(row_offsets, jnp.int32), jnp.asarray(heights, jnp.int32),
                jnp.asarray(widths, jnp.int32), scales)
        starts_l, wy_l, wx_l = _window_meta(*args, ph, ph, 2, window_l, True)
        starts_s, wy_s, wx_s = _window_meta(*args, ph, ph, 2, window_s, True)
        # span-based mask, mirroring roi_align_packed
        scale_pb = scales[levels]
        bx1 = boxes[:, 0] * np.asarray(scale_pb) - 0.5
        by1 = boxes[:, 1] * np.asarray(scale_pb) - 0.5
        roi_w = boxes[:, 2] * np.asarray(scale_pb) - 0.5 - bx1
        roi_h = boxes[:, 3] * np.asarray(scale_pb) - 0.5 - by1
        h_lf = np.asarray(heights)[np.asarray(levels)].astype(np.float32)
        w_lf = np.asarray(widths)[np.asarray(levels)].astype(np.float32)
        small = (np.minimum(roi_h, h_lf) <= window_s - 2) & (
            np.minimum(roi_w, w_lf) <= window_s - 1
        )
        assert small.any() and (~small).any(), "test must cover both buckets"
        return (packed, starts_s, wy_s, wx_s, starts_l, wy_l, wx_l,
                jnp.asarray(small), window_s, window_l, ph)

    def test_interpret_matches_xla_windows(self):
        from fsgd_tpu.ops.roi_align_packed import _xla_windows
        from fsgd_tpu.ops.pallas_roi_align import roi_align_windows_bucketed

        (packed, starts_s, wy_s, wx_s, starts_l, wy_l, wx_l, small,
         window_s, window_l, ph) = self._setup()
        want = np.asarray(_xla_windows(packed, starts_l, wy_l, wx_l, window_l, 4))
        got = np.asarray(roi_align_windows_bucketed(
            packed, starts_s, wy_s, wx_s, starts_l, wy_l, wx_l, small,
            window_s, window_l, ph, True,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_interpret_vjp_matches_xla_grad(self):
        from fsgd_tpu.ops.roi_align_packed import _xla_windows
        from fsgd_tpu.ops.pallas_roi_align import roi_align_windows_bucketed

        (packed, starts_s, wy_s, wx_s, starts_l, wy_l, wx_l, small,
         window_s, window_l, ph) = self._setup(seed=3)

        def loss_bucketed(p):
            out = roi_align_windows_bucketed(
                p, starts_s, wy_s, wx_s, starts_l, wy_l, wx_l, small,
                window_s, window_l, ph, True,
            )
            return jnp.sum(out * out)

        def loss_xla(p):
            out = _xla_windows(p, starts_l, wy_l, wx_l, window_l, 4)
            return jnp.sum(out * out)

        g_b = jax.grad(loss_bucketed)(packed)
        g_x = jax.grad(loss_xla)(packed)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_x), rtol=1e-4, atol=1e-4)
