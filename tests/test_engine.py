"""Engine tests: DefaultTrainer end-to-end on a synthetic COCO dataset
(train a few iters, checkpoint, resume, evaluate) and DefaultPredictor."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from fsgd_tpu.config import get_cfg
from fsgd_tpu.data import DatasetCatalog
from fsgd_tpu.data.datasets import register_coco_instances
from fsgd_tpu.engine import DefaultPredictor, DefaultTrainer, default_argument_parser


def _make_dataset(tmp_path, name):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        h = w = 64
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(img_dir / "i{}.png".format(i))
        images.append({"id": i + 1, "file_name": "i{}.png".format(i), "height": h, "width": w})
        annotations.append(
            {
                "id": ann_id,
                "image_id": i + 1,
                "category_id": 1,
                "bbox": [8, 8, 30, 30],
                "area": 900,
                "iscrowd": 0,
            }
        )
        ann_id += 1
    path = tmp_path / "ann.json"
    with open(path, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": [{"id": 1, "name": "obj"}]}, f
        )
    register_coco_instances(name, {}, str(path), str(img_dir))


def _tiny_cfg(tmp_path, name):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.NUM_CLASSES = 1
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = [[64, 64]]
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.TPU.PREFETCH = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


@pytest.mark.slow
class TestDefaultTrainer:
    @pytest.mark.slow
    def test_train_checkpoint_resume_eval(self, tmp_path):
        name = "engine_test_{}".format(abs(hash(str(tmp_path))) % 10 ** 8)
        _make_dataset(tmp_path, name)
        cfg = _tiny_cfg(tmp_path, name)

        trainer = DefaultTrainer(cfg)
        trainer.resume_or_load(resume=False)
        trainer.train()
        assert trainer.iter == cfg.SOLVER.MAX_ITER - 1
        # periodic + final checkpoints exist
        assert trainer.checkpointer.has_checkpoint()
        files = trainer.checkpointer.get_all_checkpoint_files()
        assert any("final" in f for f in files)
        # metrics.json written
        assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))

        # resume continues from saved iteration
        trainer2 = DefaultTrainer(cfg)
        trainer2.resume_or_load(resume=True)
        assert trainer2.start_iter == cfg.SOLVER.MAX_ITER

        # evaluation end-to-end (AP will be garbage; just exercise the path)
        results = DefaultTrainer.test(cfg, trainer.model)
        assert "bbox" in results

        DatasetCatalog.remove(name)

    def test_default_predictor(self, tmp_path):
        name = "engine_pred_{}".format(abs(hash(str(tmp_path))) % 10 ** 8)
        _make_dataset(tmp_path, name)
        cfg = _tiny_cfg(tmp_path, name)
        predictor = DefaultPredictor(cfg)
        out = predictor(np.zeros((64, 64, 3), np.uint8))
        assert "instances" in out
        DatasetCatalog.remove(name)


def test_argument_parser_fork_flags():
    parser = default_argument_parser()
    args = parser.parse_args(["--eval_visualize", "--source", "/tmp/x"])
    assert args.eval_visualize is True
    assert args.source == "/tmp/x"
