"""DensePose data pipeline + GPS evaluator tests.

Covers the subsystems the reference exercises via real DensePose-COCO data
(projects/DensePose/densepose/{structures,dataset_mapper,evaluator}.py):
annotation structures + hflip semantics, the mapper -> padded batch
contract, PNG result codec, and an end-to-end GPS evaluation on a toy
dataset with self-consistent predictions.
"""

import json
import os

import numpy as np
import pytest

from fsgd_tpu.data import rle as rle_codec
from fsgd_tpu.data.transforms.transform import HFlipTransform, NoOpTransform, TransformList
from fsgd_tpu.projects.densepose import (
    DensePoseDataRelative,
    DensePoseList,
    DensePoseResult,
    DensePoseTransformData,
    dp_annotations_to_batch_arrays,
)
from fsgd_tpu.projects.densepose.densepose_cocoeval import ApproxUVMesh, DensePoseCocoEval
from fsgd_tpu.projects.densepose.structures import iuv_maps_to_result


def _toy_dp_annotation(n_pts=6, seed=0):
    rng = np.random.RandomState(seed)
    segm_mask = np.zeros((256, 256), np.uint8)
    segm_mask[40:200, 60:180] = 1
    ann = {
        "bbox": [10.0, 20.0, 100.0, 160.0],
        "bbox_mode": 1,  # XYWH_ABS
        "category_id": 0,
        "iscrowd": 0,
        "dp_x": rng.uniform(0, 255, n_pts).tolist(),
        "dp_y": rng.uniform(0, 255, n_pts).tolist(),
        "dp_I": rng.randint(1, 25, n_pts).astype(float).tolist(),
        "dp_U": rng.uniform(0, 1, n_pts).tolist(),
        "dp_V": rng.uniform(0, 1, n_pts).tolist(),
        "dp_masks": [rle_codec.encode(segm_mask)] + [None] * 13,
    }
    return ann


class TestStructures:
    def test_data_relative_fields(self):
        ann = _toy_dp_annotation()
        dp = DensePoseDataRelative(ann, cleanup=True)
        assert dp.x.shape == (6,) and dp.segm.shape == (256, 256)
        assert np.all(dp.segm[50, 70] == 1)  # part 1 painted
        assert "dp_x" not in ann  # cleanup removed raw keys

    def test_hflip_swaps_labels_and_mirrors(self):
        ann = _toy_dp_annotation()
        ann["dp_I"] = [3.0, 4.0, 1.0]
        ann["dp_x"] = [10.0, 50.0, 100.0]
        ann["dp_y"] = [0.0, 0.0, 0.0]
        ann["dp_U"] = [0.2, 0.4, 0.6]
        ann["dp_V"] = [0.2, 0.4, 0.6]
        dp = DensePoseDataRelative(ann)
        segm_before = dp.segm.copy()
        tfm = TransformList([HFlipTransform(width=640)])
        dp.apply_transform(tfm, DensePoseTransformData.default())
        # point labels 3<->4 swap, label 1 unchanged (reference POINT_LABEL_SYMMETRIES)
        assert dp.i.tolist() == [4, 3, 1]
        # x mirrored in the 256 chart frame
        assert np.allclose(dp.x, [246.0, 206.0, 156.0])
        # segm mirrored
        assert np.array_equal(dp.segm, segm_before[:, ::-1])
        # double flip restores
        dp.apply_transform(tfm, DensePoseTransformData.default())
        assert dp.i.tolist() == [3, 4, 1]

    def test_no_flip_is_identity(self):
        ann = _toy_dp_annotation()
        dp = DensePoseDataRelative(ann)
        x0 = dp.x.copy()
        dp.apply_transform(TransformList([NoOpTransform()]), DensePoseTransformData.default())
        assert np.array_equal(dp.x, x0)

    def test_densepose_list_indexing(self):
        dp = DensePoseDataRelative(_toy_dp_annotation())
        lst = DensePoseList([dp, None, dp])
        assert len(lst) == 3
        assert lst[1] is None
        masked = lst[np.array([True, False, True])]
        assert len(masked) == 2 and masked[0] is dp
        assert len(lst[np.array([0, 2])]) == 2

    def test_result_png_roundtrip(self):
        rng = np.random.RandomState(1)
        arr = rng.randint(0, 255, (3, 37, 23)).astype(np.uint8)
        s = DensePoseResult.encode_png_data(arr)
        back = DensePoseResult.decode_png_data(arr.shape, s)
        assert np.array_equal(arr, back)

    def test_iuv_maps_to_result_shapes(self):
        s = np.ones((56, 56))
        i = np.full((56, 56), 3.0)
        u = np.full((56, 56), 0.5)
        v = np.full((56, 56), 0.25)
        out = iuv_maps_to_result(s, i, u, v, [5, 5, 40, 30])
        assert out.shape == (3, 30, 40)
        assert out[0, 15, 20] == 3
        assert abs(int(out[1, 15, 20]) - 127) <= 1


class TestMapperBatch:
    def test_dp_annotations_to_batch_arrays(self):
        from fsgd_tpu.structures import Boxes, Instances

        dp = DensePoseDataRelative(_toy_dp_annotation())
        inst = Instances((256, 256))
        inst.gt_boxes = Boxes(np.array([[10.0, 20.0, 110.0, 180.0]], np.float32))
        inst.gt_classes = np.zeros((1,), np.int64)
        inst.gt_densepose = DensePoseList([dp])
        batch = dp_annotations_to_batch_arrays([{"instances": inst}], max_gt=4, max_points=16, heatmap_size=56)
        assert batch["dp_points"].shape == (1, 4, 16, 4)
        assert batch["dp_segm"].shape == (1, 4, 56, 56)
        assert batch["dp_valid"][0, 0, :6].all() and not batch["dp_valid"][0, 0, 6:].any()
        # absolute coords inside the GT box
        pts = batch["dp_points"][0, 0, :6]
        assert (pts[:, 0] >= 10).all() and (pts[:, 0] <= 110).all()
        assert (pts[:, 1] >= 20).all() and (pts[:, 1] <= 180).all()

    def test_mapper_end_to_end(self, tmp_path):
        import cv2

        from fsgd_tpu.config import get_cfg
        from fsgd_tpu.projects.densepose import DensePoseDatasetMapper, add_densepose_config

        img_path = str(tmp_path / "im.png")
        cv2.imwrite(img_path, np.zeros((128, 96, 3), np.uint8))
        cfg = get_cfg()
        add_densepose_config(cfg)
        cfg.MODEL.MASK_ON = False
        cfg.INPUT.MIN_SIZE_TRAIN = (128,)
        mapper = DensePoseDatasetMapper(cfg, is_train=True)
        ann = _toy_dp_annotation()
        record = {
            "file_name": img_path,
            "height": 128,
            "width": 96,
            "image_id": 1,
            "annotations": [ann],
        }
        out = mapper(record)
        assert out["instances"].has("gt_densepose")
        assert isinstance(out["instances"].gt_densepose[0], DensePoseDataRelative)


def _toy_gt_json(tmp_path):
    anns = []
    images = []
    rng = np.random.RandomState(3)
    for img_id in (1, 2):
        images.append({"id": img_id, "height": 240, "width": 320, "file_name": f"{img_id}.jpg"})
        x0, y0, w, h = 30.0 + img_id * 5, 40.0, 120.0, 150.0
        n = 10
        anns.append(
            {
                "id": img_id * 10,
                "image_id": img_id,
                "category_id": 1,
                "bbox": [x0, y0, w, h],
                "area": w * h,
                "iscrowd": 0,
                "dp_x": rng.uniform(10, 245, n).tolist(),
                "dp_y": rng.uniform(10, 245, n).tolist(),
                "dp_I": rng.randint(1, 25, n).astype(float).tolist(),
                "dp_U": rng.uniform(0.05, 0.95, n).tolist(),
                "dp_V": rng.uniform(0.05, 0.95, n).tolist(),
            }
        )
    gt = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": 1, "name": "person"}],
    }
    path = str(tmp_path / "gt.json")
    with open(path, "w") as f:
        json.dump(gt, f)
    return path, gt


def _perfect_prediction(ann):
    """IUV image over the GT box that reproduces every annotated point."""
    x0, y0, w, h = ann["bbox"]
    wi, hi = int(w), int(h)
    iuv = np.zeros((3, hi, wi), np.uint8)
    px = (np.array(ann["dp_x"]) * w / 255.0).astype(int)
    py = (np.array(ann["dp_y"]) * h / 255.0).astype(int)
    px = np.clip(px, 0, wi - 1)
    py = np.clip(py, 0, hi - 1)
    iuv[0, py, px] = np.array(ann["dp_I"], int)
    iuv[1, py, px] = np.clip(np.array(ann["dp_U"]) * 255, 0, 255).astype(np.uint8)
    iuv[2, py, px] = np.clip(np.array(ann["dp_V"]) * 255, 0, 255).astype(np.uint8)
    return {
        "image_id": ann["image_id"],
        "category_id": 1,
        "bbox": ann["bbox"],
        "score": 0.9,
        "densepose": ((iuv.shape, DensePoseResult.encode_png_data(iuv)), ann["bbox"]),
    }


class TestGPSEvaluation:
    def test_perfect_predictions_score_high(self, tmp_path):
        from fsgd_tpu.data.cocoapi import COCO

        gt_path, gt = _toy_gt_json(tmp_path)
        coco_gt = COCO(gt_path)
        results = [_perfect_prediction(a) for a in gt["annotations"]]
        coco_dt = coco_gt.loadRes(results)
        ev = DensePoseCocoEval(coco_gt, coco_dt, "densepose", mesh=ApproxUVMesh())
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        assert ev.stats[0] > 0.95  # GPS-AP ~ 1 for self-consistent predictions

    def test_shifted_predictions_score_lower(self, tmp_path):
        from fsgd_tpu.data.cocoapi import COCO

        gt_path, gt = _toy_gt_json(tmp_path)
        coco_gt = COCO(gt_path)
        results = []
        for a in gt["annotations"]:
            r = _perfect_prediction(a)
            (shape, data), bb = r["densepose"]
            iuv = DensePoseResult.decode_png_data(shape, data)
            iuv[1] = 255 - iuv[1]  # corrupt U
            iuv[2] = 255 - iuv[2]  # corrupt V
            r["densepose"] = ((iuv.shape, DensePoseResult.encode_png_data(iuv)), bb)
            results.append(r)
        coco_dt = coco_gt.loadRes(results)
        ev = DensePoseCocoEval(coco_gt, coco_dt, "densepose", mesh=ApproxUVMesh())
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        assert ev.stats[0] < 0.9

    def test_evaluator_wrapper(self, tmp_path):
        """DensePoseCOCOEvaluator end-to-end on Instances with pred_densepose."""
        from fsgd_tpu.data.catalog import DatasetCatalog, MetadataCatalog
        from fsgd_tpu.projects.densepose import DensePoseCOCOEvaluator
        from fsgd_tpu.structures import Boxes, Instances

        gt_path, gt = _toy_gt_json(tmp_path)
        name = "dp_toy_eval"
        if name not in DatasetCatalog:
            DatasetCatalog.register(name, lambda: [])
        MetadataCatalog.get(name).set(json_file=gt_path)
        ev = DensePoseCOCOEvaluator(name, distributed=False, output_dir=str(tmp_path))
        ev.reset()
        s = 56
        for img, ann in zip(gt["images"], gt["annotations"]):
            x0, y0, w, h = ann["bbox"]
            inst = Instances((img["height"], img["width"]))
            inst.pred_boxes = Boxes(np.array([[x0, y0, x0 + w, y0 + h]], np.float32))
            inst.scores = np.array([0.8], np.float32)
            inst.pred_classes = np.array([0], np.int64)
            banks = np.zeros((1, s, s, 4), np.float32)
            banks[..., 0] = 1.0  # coarse fg
            banks[..., 1] = 5.0  # one patch everywhere
            banks[..., 2] = 0.5
            banks[..., 3] = 0.5
            inst.pred_densepose = banks
            ev.process([{"image_id": img["id"]}], [{"instances": inst}])
        res = ev.evaluate()
        assert "densepose" in res and "AP" in res["densepose"]
        assert os.path.isfile(os.path.join(str(tmp_path), "coco_densepose_results.json"))


class TestVis:
    def _result(self):
        rng = np.random.RandomState(5)
        iuv = np.zeros((3, 40, 30), np.uint8)
        iuv[0, 5:35, 5:25] = rng.randint(1, 25, (30, 20))
        iuv[1] = rng.randint(0, 255, (40, 30))
        iuv[2] = rng.randint(0, 255, (40, 30))
        return DensePoseResult(np.array([[10.0, 12.0, 30.0, 40.0]]), [iuv])

    @pytest.mark.parametrize("name", ["dp_segm", "dp_u", "dp_v", "dp_contour"])
    def test_densepose_visualizers(self, name):
        from fsgd_tpu.projects.densepose.vis import (
            DensePoseResultsContourVisualizer,
            DensePoseResultsFineSegmentationVisualizer,
            DensePoseResultsUVisualizer,
            DensePoseResultsVVisualizer,
        )

        catalog = {
            "dp_segm": DensePoseResultsFineSegmentationVisualizer,
            "dp_u": DensePoseResultsUVisualizer,
            "dp_v": DensePoseResultsVVisualizer,
            "dp_contour": DensePoseResultsContourVisualizer,
        }
        img = np.full((64, 64, 3), 128, np.uint8)
        out = catalog[name]().visualize(img, self._result())
        assert out.shape == (64, 64, 3)
        assert not np.array_equal(out, np.full((64, 64, 3), 128, np.uint8))

    def test_compound_and_extractors(self):
        from fsgd_tpu.projects.densepose.vis import (
            CompoundVisualizer,
            DensePoseResultsUVisualizer,
            ScoredBoundingBoxVisualizer,
            create_extractor,
        )
        from fsgd_tpu.structures import Boxes, Instances

        inst = Instances((64, 64))
        inst.pred_boxes = Boxes(np.array([[10.0, 12.0, 40.0, 52.0]], np.float32))
        inst.scores = np.array([0.7], np.float32)
        inst.pred_classes = np.array([0], np.int64)
        banks = np.zeros((1, 56, 56, 4), np.float32)
        banks[..., 0] = 1.0
        banks[..., 1] = 3.0
        banks[..., 2] = 0.5
        banks[..., 3] = 0.5
        inst.pred_densepose = banks
        vis = CompoundVisualizer([DensePoseResultsUVisualizer(), ScoredBoundingBoxVisualizer()])
        data = create_extractor(vis)(inst)
        assert len(data) == 2 and data[0] is not None and data[1] is not None
        img = np.full((64, 64, 3), 90, np.uint8)
        out = vis.visualize(img, data)
        assert out.shape == (64, 64, 3)


class TestConfigs:
    def test_densepose_configs_load(self):
        from fsgd_tpu.config import get_cfg
        from fsgd_tpu.projects.densepose import add_densepose_config

        for name in (
            "projects/DensePose/configs/densepose_rcnn_R_50_FPN_s1x.yaml",
            "projects/DensePose/configs/densepose_rcnn_R_101_FPN_s1x.yaml",
            "projects/DensePose/configs/quick_schedules/densepose_rcnn_R_50_FPN_instant_test.yaml",
        ):
            cfg = get_cfg()
            add_densepose_config(cfg)
            cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", name))
            assert cfg.MODEL.ROI_HEADS.NAME == "DensePoseROIHeads"
            assert cfg.MODEL.DENSEPOSE_ON

    def test_register_datasets(self):
        from fsgd_tpu.data.catalog import DatasetCatalog
        from fsgd_tpu.projects.densepose import register_densepose_datasets

        register_densepose_datasets()
        assert "densepose_coco_2014_train" in DatasetCatalog
        register_densepose_datasets()  # idempotent


class TestQueryDB:
    def test_entry_selector(self):
        sys_path_add = os.path.join(os.path.dirname(__file__), "..", "tools")
        import sys

        if sys_path_add not in sys.path:
            sys.path.insert(0, sys_path_add)
        from query_db import EntrySelector

        sel = EntrySelector.from_string("*")
        assert sel({"anything": 1})
        sel = EntrySelector.from_string("image_id:int=18-100")
        assert sel({"image_id": 50}) and not sel({"image_id": 101})
        sel = EntrySelector.from_string("file_name=a.jpg,image_id:int=3")
        assert sel({"file_name": "a.jpg", "image_id": 3})
        assert not sel({"file_name": "b.jpg", "image_id": 3})

    def test_gt_data_visualizers(self):
        from fsgd_tpu.projects.densepose.vis import (
            BoundingBoxVisualizer,
            DensePoseDataCoarseSegmentationVisualizer,
            DensePoseDataPointsUVisualizer,
        )

        dp = DensePoseDataRelative(_toy_dp_annotation())
        img = np.full((128, 128, 3), 100, np.uint8)
        boxes = [np.array([10.0, 20.0, 60.0, 80.0])]
        out = DensePoseDataCoarseSegmentationVisualizer().visualize(img.copy(), (boxes, [dp]))
        assert not np.array_equal(out, img)
        out = DensePoseDataPointsUVisualizer().visualize(img.copy(), (boxes, [dp]))
        assert out.shape == img.shape
        out = BoundingBoxVisualizer().visualize(img.copy(), boxes)
        assert not np.array_equal(out, img)
