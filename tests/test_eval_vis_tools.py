"""Tests for extra evaluators (VOC AP, SemSeg mIoU, PQ), the visualizer, and
gambler visualization grids."""

import numpy as np
import pytest

from fsgd_tpu.evaluation.pascal_voc_evaluation import voc_ap, voc_eval
from fsgd_tpu.evaluation.panoptic_evaluation import _merge_stats, _summarize_pq, pq_compute_single_image
from fsgd_tpu.gambler.visualization import make_grid
from fsgd_tpu.utils.colormap import colormap
from fsgd_tpu.utils.visualizer import GenericMask, Visualizer
from fsgd_tpu.structures import Boxes, Instances


class TestVOCEval:
    def test_voc_ap_perfect(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert abs(voc_ap(rec, prec, use_07_metric=False) - 1.0) < 1e-9
        assert abs(voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-6

    def test_voc_eval_matching(self):
        annotations = {
            "img1": [
                {"name": "car", "difficult": 0, "bbox": [10, 10, 50, 50]},
                {"name": "car", "difficult": 1, "bbox": [60, 60, 90, 90]},  # difficult: excluded
            ]
        }
        detections = [
            ("img1", 0.9, 10, 10, 50, 50),  # TP
            ("img1", 0.8, 200, 200, 240, 240),  # FP
        ]
        rec, prec, ap = voc_eval(detections, annotations, "car", use_07_metric=False)
        assert rec[-1] == 1.0  # the one non-difficult gt found
        assert abs(ap - 1.0) < 1e-9  # TP ranked first -> precision 1 at all recalls


class TestPQ:
    def test_perfect_match(self):
        pan = np.zeros((10, 10), np.int32)
        pan[:5] = 1
        pan[5:] = 2
        segs = [{"id": 1, "category_id": 3}, {"id": 2, "category_id": 4}]
        stats = pq_compute_single_image(pan, segs, pan.copy(), [dict(s) for s in segs])
        res = _summarize_pq(_merge_stats([stats]))
        assert abs(res["PQ"] - 100.0) < 1e-6

    def test_miss_and_fp(self):
        pan_gt = np.zeros((10, 10), np.int32)
        pan_gt[:5] = 1
        gt_segs = [{"id": 1, "category_id": 3}]
        pan_pred = np.zeros((10, 10), np.int32)
        pan_pred[7:, 7:] = 5
        pred_segs = [{"id": 5, "category_id": 3}]
        stats = pq_compute_single_image(pan_gt, gt_segs, pan_pred, pred_segs)
        res = _summarize_pq(_merge_stats([stats]))
        assert res["PQ"] == 0.0


class TestVisualizer:
    def test_draw_instances(self):
        img = np.zeros((64, 64, 3), np.uint8)
        inst = Instances((64, 64))
        inst.pred_boxes = Boxes(np.array([[5, 5, 30, 30], [20, 20, 60, 60]], np.float32))
        inst.scores = np.array([0.9, 0.7])
        inst.pred_classes = np.array([0, 1])
        vis = Visualizer(img)
        out = vis.draw_instance_predictions(inst)
        rendered = out.get_image()
        assert rendered.shape[2] == 3
        assert rendered.sum() > 0  # something was drawn

    def test_generic_mask(self):
        poly = [np.array([2, 2, 10, 2, 10, 10, 2, 10], np.float64)]
        gm = GenericMask(poly, 16, 16)
        assert gm.mask.shape == (16, 16)
        assert gm.area() > 0
        bb = gm.bbox()
        assert bb[0] >= 1 and bb[2] <= 11

    def test_colormap(self):
        cm = colormap(n=20)
        assert cm.shape == (20, 3)
        assert len({tuple(c) for c in np.round(cm, 4)}) == 20  # distinct


class TestGamblerVis:
    def test_make_grid(self):
        imgs = [np.random.rand(8, 8) for _ in range(5)]
        grid = make_grid(imgs, ncols=3)
        assert grid.ndim == 2
        assert grid.max() <= 1.0 + 1e-6


class TestVisualizerExtended:
    """Rotated boxes, connected keypoints, color modes (reference
    visualizer.py:324-372, 648-748, 1028-1081)."""

    def _img(self):
        return (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)

    def test_overlay_rotated_instances(self):
        from fsgd_tpu.utils.visualizer import Visualizer

        v = Visualizer(self._img())
        boxes = np.array([[32.0, 32.0, 20.0, 10.0, 30.0], [16.0, 16.0, 8.0, 6.0, -15.0]])
        out = v.overlay_instances(boxes=boxes, labels=["a", "b"])
        assert out.get_image().shape[-1] == 3

    def test_draw_and_connect_keypoints(self):
        from fsgd_tpu.data.datasets.builtin_meta import COCO_PERSON_KEYPOINT_NAMES, KEYPOINT_CONNECTION_RULES
        from fsgd_tpu.utils.visualizer import Visualizer

        class Meta:
            def get(self, k, default=None):
                return {
                    "keypoint_names": COCO_PERSON_KEYPOINT_NAMES,
                    "keypoint_connection_rules": KEYPOINT_CONNECTION_RULES,
                }.get(k, default)

        v = Visualizer(self._img(), metadata=Meta())
        kps = np.zeros((len(COCO_PERSON_KEYPOINT_NAMES), 3))
        kps[:, 0] = np.linspace(10, 50, len(kps))
        kps[:, 1] = np.linspace(10, 50, len(kps))
        kps[:, 2] = 1.0
        out = v.draw_and_connect_keypoints(kps)
        assert out.get_image().shape[-1] == 3

    def test_image_bw_mode(self):
        from fsgd_tpu.structures import Boxes, Instances
        from fsgd_tpu.utils.visualizer import ColorMode, Visualizer

        inst = Instances((64, 64))
        inst.pred_boxes = Boxes(np.array([[10.0, 10.0, 40.0, 40.0]], np.float32))
        inst.scores = np.array([0.9], np.float32)
        inst.pred_classes = np.array([0], np.int64)
        masks = np.zeros((1, 64, 64), np.uint8)
        masks[0, 15:35, 15:35] = 1
        inst.pred_masks = masks
        v = Visualizer(self._img(), instance_mode=ColorMode.IMAGE_BW)
        out = v.draw_instance_predictions(inst)
        assert out.get_image().shape[-1] == 3

    def test_brightness_and_jitter(self):
        from fsgd_tpu.utils.visualizer import Visualizer

        v = Visualizer(self._img())
        lighter = v._change_color_brightness((0.2, 0.4, 0.6), 0.7)
        assert all(0 <= c <= 1 for c in lighter)
        j = v._jitter((0.5, 0.5, 0.5))
        assert len(j) == 3
