"""Gambler GAN end-to-end through the CLI (VERDICT round-2 item 8).

Runs 4 full GANTrainer iterations (2 G + 2 D with a 1/1 split) through
``tools/train_net_gambler.py`` on the micro-COCO fixture over an 8-virtual-
device CPU mesh, and checks everything the reference's GAN loop produces
(reference ImbalanceDetection/train_net.py:502-590):

  - both loss streams in metrics.json (loss_gambler + loss_detector),
  - both checkpoint streams on disk (detector at OUTPUT_DIR, gambler under
    OUTPUT_DIR/gambler_models),
  - VIS_PERIOD betting-map visualization PNGs under OUTPUT_DIR/images.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_ROOT = os.path.join(REPO, "tests", "data", "datasets")


@pytest.mark.slow
def test_train_net_gambler_four_iters(tmp_path):
    out_dir = str(tmp_path / "output")
    env = dict(os.environ)
    env.update(
        FSGD_DATASETS=FIXTURE_ROOT,
        JAX_PLATFORMS="cpu",
        # drop the axon sitecustomize (PYTHONPATH) so the subprocess honors
        # JAX_PLATFORMS=cpu instead of grabbing the TPU tunnel
        PYTHONPATH="",
        XLA_FLAGS=(env.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8"
                   + " --xla_cpu_collective_call_terminate_timeout_seconds=600").strip(),
    )
    opts = [
        "DATASETS.TRAIN", "('coco_2017_val_100',)",
        "DATASETS.TEST", "()",
        "MODEL.WEIGHTS", "",
        "MODEL.BACKBONE.FREEZE_AT", "0",
        "MODEL.GAMBLER_HEAD.GAMBLER_ITERATIONS", "1",
        "MODEL.GAMBLER_HEAD.DETECTOR_ITERATIONS", "1",
        "MODEL.GAMBLER_HEAD.IN_LAYERS", "[16, 8, 4, 2, 1]",
        "MODEL.GAMBLER_HEAD.VIS_PERIOD", "2",
        "MODEL.GAMBLER_HEAD.SAVE_VIS_FILES", "True",
        "SOLVER.MAX_ITER", "4",
        "SOLVER.IMS_PER_BATCH", "8",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "SOLVER.WARMUP_ITERS", "2",
        "INPUT.MIN_SIZE_TRAIN", "(96,)",
        "INPUT.MAX_SIZE_TRAIN", "128",
        "TPU.IMAGE_BUCKETS", "[[128, 128]]",
        "TPU.COMPUTE_DTYPE", "float32",
        "OUTPUT_DIR", out_dir,
    ]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_net_gambler.py"),
         "--config-file",
         os.path.join(REPO, "configs", "ImbalanceDetection", "quick_schedules",
                      "simple_retinanet.yaml")]
        + opts,
        env=env, capture_output=True, text=True, timeout=4500, cwd=REPO,
    )
    assert proc.returncode == 0, "gambler CLI failed:\n%s\n%s" % (
        proc.stdout[-4000:], proc.stderr[-4000:])

    metrics = os.path.join(out_dir, "metrics.json")
    assert os.path.exists(metrics)
    lines = [json.loads(l) for l in open(metrics)]
    assert any("loss_gambler" in l for l in lines)
    assert any("loss_detector" in l for l in lines)

    # two checkpoint streams (reference train_net.py:541-558)
    det_ckpts = [f for f in os.listdir(out_dir) if "model" in f or "checkpoint" in f]
    assert det_ckpts, "no detector checkpoints in %s: %s" % (out_dir, os.listdir(out_dir))
    gam_dir = os.path.join(out_dir, "gambler_models")
    assert os.path.isdir(gam_dir) and os.listdir(gam_dir), "no gambler checkpoint stream"

    # VIS_PERIOD betting-map sheets
    img_dir = os.path.join(out_dir, "images")
    assert os.path.isdir(img_dir) and any(
        f.endswith(".png") for f in os.listdir(img_dir)
    ), "no VIS_PERIOD visualization PNGs"
