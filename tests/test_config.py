"""Config system tests (modeled on reference tests/test_config.py:25-54)."""

import os
import tempfile

import pytest

from fsgd_tpu.config import CfgNode, get_cfg, set_global_cfg, global_cfg, add_gambler_config
from fsgd_tpu.config import downgrade_config, upgrade_config


def test_defaults_tree():
    cfg = get_cfg()
    assert cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN"
    assert cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA == 2.0
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert cfg.INPUT.RANDOM_FLIPPING is True  # fork addition
    assert cfg.MODEL.GAMBLER_ON is False
    assert cfg.VERSION == 2


def test_clone_independent():
    cfg = get_cfg()
    cfg2 = cfg.clone()
    cfg2.MODEL.MASK_ON = True
    assert cfg.MODEL.MASK_ON is False


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises((AttributeError, KeyError)):
        cfg.MODEL.MASK_ON = True
    cfg.defrost()
    cfg.MODEL.MASK_ON = True
    assert cfg.MODEL.MASK_ON


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["MODEL.MASK_ON", "True", "SOLVER.BASE_LR", "0.02"])
    assert cfg.MODEL.MASK_ON is True
    assert cfg.SOLVER.BASE_LR == 0.02
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.DOES_NOT_EXIST", "1"])


def test_merge_from_file_with_base():
    with tempfile.TemporaryDirectory() as d:
        base = os.path.join(d, "base.yaml")
        child = os.path.join(d, "child.yaml")
        with open(base, "w") as f:
            f.write("MODEL:\n  MASK_ON: True\n  RESNETS:\n    DEPTH: 101\n")
        with open(child, "w") as f:
            f.write('_BASE_: "base.yaml"\nMODEL:\n  RESNETS:\n    DEPTH: 50\nSOLVER:\n  BASE_LR: 0.01\n')
        cfg = get_cfg()
        cfg.merge_from_file(child)
        assert cfg.MODEL.MASK_ON is True  # from base
        assert cfg.MODEL.RESNETS.DEPTH == 50  # overridden by child
        assert cfg.SOLVER.BASE_LR == 0.01


def test_yaml_eval_tag():
    """The fork's Base-RetinaNet.yaml uses !!python/object/apply:eval for anchor sizes."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cfg.yaml")
        with open(p, "w") as f:
            f.write(
                "MODEL:\n  ANCHOR_GENERATOR:\n    SIZES: !!python/object/apply:eval\n"
                '      ["[[x, x * 2**(1.0/3), x * 2**(2.0/3) ] for x in [32, 64, 128, 256, 512 ]]"]\n'
            )
        cfg = get_cfg()
        cfg.merge_from_file(p)
        sizes = cfg.MODEL.ANCHOR_GENERATOR.SIZES
        assert len(sizes) == 5 and len(sizes[0]) == 3
        assert abs(sizes[0][1] - 32 * 2 ** (1.0 / 3)) < 1e-6


def test_version_upgrade_downgrade_roundtrip():
    cfg = get_cfg()
    latest = cfg.VERSION
    old = downgrade_config(cfg, to_version=1)
    assert old.VERSION == 1
    # v1 configs keep anchors under RPN/RETINANET, not ANCHOR_GENERATOR
    assert "SIZES" not in old.MODEL.ANCHOR_GENERATOR
    assert old.MODEL.RPN.ANCHOR_SIZES == cfg.MODEL.ANCHOR_GENERATOR.SIZES
    new = upgrade_config(old)
    assert new.VERSION == latest
    assert new.MODEL.ANCHOR_GENERATOR.SIZES == cfg.MODEL.ANCHOR_GENERATOR.SIZES
    assert "ANCHOR_SIZES" not in new.MODEL.RPN


def test_guess_version_v1_merge():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "old.yaml")
        with open(p, "w") as f:
            f.write('MODEL:\n  WEIGHT: "/path/to/weight"\n')
        cfg = get_cfg()
        cfg.merge_from_file(p)
        assert cfg.MODEL.WEIGHTS == "/path/to/weight"


def test_gambler_config():
    cfg = get_cfg()
    add_gambler_config(cfg)
    assert cfg.MODEL.GAMBLER_ON is True
    assert cfg.MODEL.GAMBLER_HEAD.GAMBLER_KAPPA == 2200
    assert cfg.MODEL.GAMBLER_HEAD.BASE_LR == cfg.SOLVER.BASE_LR
    assert cfg.MODEL.GAMBLER_HEAD.IN_LAYERS == [80, 40, 20, 10, 5]


def test_global_cfg():
    cfg = get_cfg()
    cfg.MODEL.GAMBLER_ON = True
    set_global_cfg(cfg)
    assert global_cfg.MODEL.GAMBLER_ON is True


def test_new_allowed():
    cfg = CfgNode({"A": 1})
    cfg.set_new_allowed(True)
    cfg.merge_from_other_cfg(CfgNode({"B": {"C": 2}}))
    assert cfg.B.C == 2
