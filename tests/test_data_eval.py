"""Data pipeline + evaluation tests: RLE codec, COCO loading, mapper, native
train loader, COCOeval sanity (analytic APs), full COCOEvaluator round trip."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fsgd_tpu.config import get_cfg
from fsgd_tpu.data import rle as rle_codec
from fsgd_tpu.data import (
    DatasetCatalog,
    MetadataCatalog,
    DatasetMapper,
    build_detection_test_loader,
    build_detection_train_loader,
)
from fsgd_tpu.data.cocoapi import COCO
from fsgd_tpu.data.datasets import load_coco_json, register_coco_instances
from fsgd_tpu.data.samplers import InferenceSampler, RepeatFactorTrainingSampler, TrainingSampler
from fsgd_tpu.evaluation import COCOEvaluator, COCOeval, inference_on_dataset
from fsgd_tpu.structures import Boxes, Instances


class TestRLE:
    def test_roundtrip_random(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            mask = rng.rand(37, 23) > 0.5
            rle = rle_codec.encode(mask)
            back = rle_codec.decode(rle)
            np.testing.assert_array_equal(back.astype(bool), mask)
            assert rle_codec.area(rle) == int(mask.sum())

    def test_empty_and_full(self):
        for mask in [np.zeros((5, 7), bool), np.ones((5, 7), bool)]:
            back = rle_codec.decode(rle_codec.encode(mask))
            np.testing.assert_array_equal(back.astype(bool), mask)

    def test_bbox(self):
        mask = np.zeros((10, 10), bool)
        mask[2:5, 3:8] = True
        bb = rle_codec.to_bbox(rle_codec.encode(mask))
        np.testing.assert_allclose(bb, [3, 2, 5, 3])

    def test_rle_iou(self):
        a = np.zeros((10, 10), bool)
        a[:5] = True  # 50 px
        b = np.zeros((10, 10), bool)
        b[3:8] = True  # 50 px, 20 overlap
        ra, rb = rle_codec.encode(a), rle_codec.encode(b)
        iou = rle_codec.rle_iou([ra], [rb], [False])
        np.testing.assert_allclose(iou, [[20 / 80]], rtol=1e-9)
        ioa = rle_codec.rle_iou([ra], [rb], [True])  # crowd: inter / det area
        np.testing.assert_allclose(ioa, [[20 / 50]], rtol=1e-9)


def _make_fake_coco(tmp_path, num_images=4, with_masks=True):
    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        h, w = 60 + 10 * (i % 2), 80
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = "img{:03d}.png".format(i)
        Image.fromarray(arr).save(img_dir / fname)
        images.append({"id": i + 1, "file_name": fname, "height": h, "width": w})
        for j in range(2):
            x, y = int(rng.randint(0, w // 2)), int(rng.randint(0, h // 2))
            bw, bh = int(rng.randint(10, 20)), int(rng.randint(10, 20))
            ann = {
                "id": ann_id,
                "image_id": i + 1,
                "category_id": [1, 3][j % 2],
                "bbox": [x, y, bw, bh],
                "area": bw * bh,
                "iscrowd": 0,
            }
            if with_masks:
                ann["segmentation"] = [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]]
            annotations.append(ann)
            ann_id += 1
    categories = [{"id": 1, "name": "thing_a"}, {"id": 3, "name": "thing_b"}]
    coco = {"images": images, "annotations": annotations, "categories": categories}
    json_path = tmp_path / "annotations.json"
    with open(json_path, "w") as f:
        json.dump(coco, f)
    return str(json_path), str(img_dir)


@pytest.fixture()
def fake_dataset(tmp_path):
    name = "fake_coco_{}".format(abs(hash(str(tmp_path))) % 10 ** 8)
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    json_path, img_dir = _make_fake_coco(tmp_path)
    register_coco_instances(name, {}, json_path, img_dir)
    yield name, json_path, img_dir
    DatasetCatalog.remove(name)


class TestCOCOLoading:
    def test_load_coco_json(self, fake_dataset):
        name, json_path, img_dir = fake_dataset
        dicts = load_coco_json(json_path, img_dir, name + "_x")
        assert len(dicts) == 4
        d = dicts[0]
        assert set(d.keys()) >= {"file_name", "height", "width", "image_id", "annotations"}
        anns = d["annotations"]
        assert len(anns) == 2
        # category ids remapped to contiguous [0, 1]
        assert {a["category_id"] for a in anns} <= {0, 1}

    def test_mapper_train(self, fake_dataset):
        name, _, _ = fake_dataset
        cfg = get_cfg()
        cfg.DATASETS.TRAIN = (name,)
        cfg.INPUT.MIN_SIZE_TRAIN = (64,)
        cfg.INPUT.MAX_SIZE_TRAIN = 128
        cfg.MODEL.MASK_ON = True
        mapper = DatasetMapper(cfg, is_train=True)
        d = DatasetCatalog.get(name)[0]
        out = mapper(d)
        assert out["image"].dtype == np.float32
        assert "instances" in out
        inst = out["instances"]
        assert inst.has("gt_boxes") and inst.has("gt_classes") and inst.has("gt_masks")
        # boxes within image
        boxes = np.asarray(inst.gt_boxes.tensor)
        assert (boxes[:, 2] <= out["image"].shape[1] + 1e-3).all()

    def test_train_loader_native_batches(self, fake_dataset):
        name, _, _ = fake_dataset
        cfg = get_cfg()
        cfg.DATASETS.TRAIN = (name,)
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.INPUT.MIN_SIZE_TRAIN = (64,)
        cfg.INPUT.MAX_SIZE_TRAIN = 96
        cfg.MODEL.MASK_ON = True
        cfg.TPU.IMAGE_BUCKETS = [[96, 96]]
        cfg.TPU.MAX_GT_PER_IMAGE = 8
        cfg.TPU.PREFETCH = 0
        loader = build_detection_train_loader(cfg)
        it = iter(loader)
        batch = next(it)
        assert batch["image"].shape == (2, 96, 96, 3)
        assert batch["gt_boxes"].shape == (2, 8, 4)
        assert batch["gt_valid"].any()
        assert batch["gt_masks"].shape == (2, 8, 24, 24)  # stride 4
        assert batch["gt_masks"].sum() > 0

    def test_train_loader_mapper_failure_fallback(self, fake_dataset):
        """Reference data/common.py:34-55 semantics: a failing index is
        quarantined and replaced with a random other index — one corrupt
        image never kills training."""
        name, _, _ = fake_dataset
        cfg = get_cfg()
        cfg.DATASETS.TRAIN = (name,)
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.INPUT.MIN_SIZE_TRAIN = (64,)
        cfg.INPUT.MAX_SIZE_TRAIN = 96
        cfg.TPU.IMAGE_BUCKETS = [[96, 96]]
        cfg.TPU.MAX_GT_PER_IMAGE = 8
        cfg.TPU.PREFETCH = 0
        loader = build_detection_train_loader(cfg)

        real_mapper = loader.mapper
        calls = {"bad": 0}

        def flaky(d):
            if d["image_id"] == loader.dataset_dicts[0]["image_id"]:
                calls["bad"] += 1
                raise IOError("synthetic corrupt image")
            return real_mapper(d)

        loader.mapper = flaky
        it = iter(loader)
        for _ in range(4):  # drains >1 full epoch of the 4-image dataset
            batch = next(it)
            assert batch["image"].shape[0] == 2
        # the corrupt index was hit, quarantined, and never blocked a batch
        assert calls["bad"] >= 1
        assert 0 not in loader._fallback_candidates

    def test_test_loader(self, fake_dataset):
        name, _, _ = fake_dataset
        cfg = get_cfg()
        cfg.DATASETS.TEST = (name,)
        loader = build_detection_test_loader(cfg, name)
        assert len(loader) == 4
        item = next(iter(loader))
        assert isinstance(item, list) and "image" in item[0]


class TestSamplers:
    def test_training_sampler_infinite(self):
        s = TrainingSampler(5, seed=0)
        out = [next(iter(s)) for _ in range(1)]
        it = iter(s)
        seq = [next(it) for _ in range(12)]
        assert set(seq[:5]) == {0, 1, 2, 3, 4}

    def test_inference_sampler(self):
        s = InferenceSampler(7)
        assert list(s) == list(range(7))

    def test_repeat_factor(self):
        dicts = [
            {"annotations": [{"category_id": 0}]},
        ] * 9 + [{"annotations": [{"category_id": 1}]}]
        s = RepeatFactorTrainingSampler(dicts, repeat_thresh=0.5, seed=0)
        it = iter(s)
        seq = [next(it) for _ in range(40)]
        # rare category image (index 9) must be oversampled beyond 1/10
        assert seq.count(9) > 4


class TestCOCOevalAnalytic:
    def _gt_coco(self):
        c = COCO()
        c.dataset = {
            "images": [{"id": 1, "height": 100, "width": 100}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 0}
            ],
            "categories": [{"id": 1, "name": "x"}],
        }
        c.createIndex()
        return c

    def test_perfect_detection(self):
        gt = self._gt_coco()
        dt = gt.loadRes([{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9}])
        e = COCOeval(gt, dt, "bbox")
        e.evaluate()
        e.accumulate()
        e.summarize()
        assert abs(e.stats[0] - 1.0) < 1e-6  # AP
        assert abs(e.stats[1] - 1.0) < 1e-6  # AP50

    def test_iou_half_detection(self):
        gt = self._gt_coco()
        dt = gt.loadRes([{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 5], "score": 0.9}])
        e = COCOeval(gt, dt, "bbox")
        e.evaluate()
        e.accumulate()
        e.summarize()
        # IoU = 0.5 matches only at threshold 0.5 -> AP = 0.1
        assert abs(e.stats[0] - 0.1) < 1e-6
        assert abs(e.stats[1] - 1.0) < 1e-6

    def test_false_positive_ranking(self):
        gt = self._gt_coco()
        dt = gt.loadRes(
            [
                {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.5},
                {"image_id": 1, "category_id": 1, "bbox": [50, 50, 10, 10], "score": 0.9},
            ]
        )
        e = COCOeval(gt, dt, "bbox")
        e.evaluate()
        e.accumulate()
        e.summarize()
        # FP ranked first: precision at recall 1 is 0.5 -> AP ~ 0.5 (101-pt)
        assert 0.4 < e.stats[0] < 0.6


class TestCOCOEvaluatorEndToEnd:
    def test_gt_as_predictions_gives_ap100(self, fake_dataset, tmp_path):
        name, _, _ = fake_dataset
        # ensure metadata registered via loader
        dicts = DatasetCatalog.get(name)
        evaluator = COCOEvaluator(name, distributed=False, output_dir=str(tmp_path / "eval"))
        evaluator.reset()
        for d in dicts:
            inst = Instances((d["height"], d["width"]))
            from fsgd_tpu.structures import BoxMode

            boxes = np.array(
                [BoxMode.convert(a["bbox"], a["bbox_mode"], BoxMode.XYXY_ABS) for a in d["annotations"]],
                dtype=np.float32,
            )
            inst.pred_boxes = Boxes(boxes)
            inst.scores = np.full((len(boxes),), 0.95, np.float32)
            inst.pred_classes = np.array([a["category_id"] for a in d["annotations"]], np.int64)
            evaluator.process([{"image_id": d["image_id"]}], [{"instances": inst}])
        results = evaluator.evaluate()
        assert "bbox" in results
        assert abs(results["bbox"]["AP"] - 100.0) < 1e-4
        # per-category APs present
        assert "AP-thing_a" in results["bbox"]
