"""Backward-compatibility of config versions.

Mirrors the behavior of the reference's detectron2/config/compat.py:33-240:
partial configs written for an older config VERSION are auto-upgraded when
merged (rename tables for v1->v2), and full configs can be downgraded for
export.  Implemented freshly on top of our :class:`CfgNode`.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

from .cfg_node import CfgNode as CN

__all__ = ["upgrade_config", "downgrade_config", "guess_version", "LATEST_VERSION"]

LATEST_VERSION = 2


def upgrade_config(cfg: CN, to_version: Optional[int] = None) -> CN:
    cfg = cfg.clone()
    if to_version is None:
        to_version = LATEST_VERSION
    assert cfg.VERSION <= to_version, (cfg.VERSION, to_version)
    for k in range(cfg.VERSION, to_version):
        converter = globals()["ConverterV" + str(k + 1)]
        converter.upgrade(cfg)
        cfg.VERSION = k + 1
    return cfg


def downgrade_config(cfg: CN, to_version: int) -> CN:
    cfg = cfg.clone()
    assert cfg.VERSION >= to_version, (cfg.VERSION, to_version)
    for k in range(cfg.VERSION, to_version, -1):
        converter = globals()["ConverterV" + str(k)]
        converter.downgrade(cfg)
        cfg.VERSION = k - 1
    return cfg


def guess_version(cfg: CN, filename: str) -> int:
    """Guess the version of a partial config missing the VERSION field."""
    logger = logging.getLogger(__name__)

    def _has(name: str) -> bool:
        cur = cfg
        for n in name.split("."):
            if n not in cur:
                return False
            cur = cur[n]
        return True

    if _has("MODEL.WEIGHT") or _has("TEST.AUG_ON"):
        ret = 1
    else:
        ret = LATEST_VERSION
    logger.warning("Config '%s' has no VERSION; assuming v%d.", filename, ret)
    return ret


def _ensure_path(cfg: CN, key_seq: List[str]) -> CN:
    cur = cfg
    for k in key_seq:
        if k not in cur:
            dict.__setitem__(cur, k, CN())
        cur = cur[k]
    return cur


def _rename(cfg: CN, old: str, new: str) -> None:
    old_keys, new_keys = old.split("."), new.split(".")
    # fetch old value
    cur = cfg
    for k in old_keys:
        if k not in cur:
            return  # partial configs may not contain the key at all
        cur = cur[k]
    value = cur
    # set new
    parent = _ensure_path(cfg, new_keys[:-1])
    dict.__setitem__(parent, new_keys[-1], value)
    # delete old
    cur = cfg
    for k in old_keys[:-1]:
        cur = cur[k]
    dict.__delitem__(cur, old_keys[-1])


def _del(cfg: CN, name: str) -> None:
    cur = cfg
    keys = name.split(".")
    for k in keys[:-1]:
        if k not in cur:
            return
        cur = cur[k]
    if keys[-1] in cur:
        dict.__delitem__(cur, keys[-1])


class _RenameConverter:
    RENAME: List[Tuple[str, str]] = []

    @classmethod
    def upgrade(cls, cfg: CN) -> None:
        for old, new in cls.RENAME:
            _rename(cfg, old, new)

    @classmethod
    def downgrade(cls, cfg: CN) -> None:
        for old, new in cls.RENAME[::-1]:
            _rename(cfg, new, old)


class ConverterV1(_RenameConverter):
    RENAME = [("MODEL.RPN_HEAD.NAME", "MODEL.RPN.HEAD_NAME")]


class ConverterV2(_RenameConverter):
    """The large pre-release rename bulk (reference compat.py:168-202)."""

    RENAME = [
        ("MODEL.WEIGHT", "MODEL.WEIGHTS"),
        ("MODEL.PANOPTIC_FPN.SEMANTIC_LOSS_SCALE", "MODEL.SEM_SEG_HEAD.LOSS_WEIGHT"),
        ("MODEL.PANOPTIC_FPN.RPN_LOSS_SCALE", "MODEL.RPN.LOSS_WEIGHT"),
        ("MODEL.PANOPTIC_FPN.INSTANCE_LOSS_SCALE", "MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT"),
        ("MODEL.PANOPTIC_FPN.COMBINE_ON", "MODEL.PANOPTIC_FPN.COMBINE.ENABLED"),
        ("MODEL.PANOPTIC_FPN.COMBINE_OVERLAP_THRESHOLD", "MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH"),
        ("MODEL.PANOPTIC_FPN.COMBINE_STUFF_AREA_LIMIT", "MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT"),
        (
            "MODEL.PANOPTIC_FPN.COMBINE_INSTANCES_CONFIDENCE_THRESHOLD",
            "MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH",
        ),
        ("MODEL.ROI_HEADS.SCORE_THRESH", "MODEL.ROI_HEADS.SCORE_THRESH_TEST"),
        ("MODEL.ROI_HEADS.NMS", "MODEL.ROI_HEADS.NMS_THRESH_TEST"),
        ("MODEL.RETINANET.INFERENCE_SCORE_THRESHOLD", "MODEL.RETINANET.SCORE_THRESH_TEST"),
        ("MODEL.RETINANET.INFERENCE_TOPK_CANDIDATES", "MODEL.RETINANET.TOPK_CANDIDATES_TEST"),
        ("MODEL.RETINANET.INFERENCE_NMS_THRESHOLD", "MODEL.RETINANET.NMS_THRESH_TEST"),
        ("TEST.DETECTIONS_PER_IMG", "TEST.DETECTIONS_PER_IMAGE"),
        ("TEST.AUG_ON", "TEST.AUG.ENABLED"),
        ("TEST.AUG_MIN_SIZES", "TEST.AUG.MIN_SIZES"),
        ("TEST.AUG_MAX_SIZE", "TEST.AUG.MAX_SIZE"),
        ("TEST.AUG_FLIP", "TEST.AUG.FLIP"),
    ]

    @classmethod
    def upgrade(cls, cfg: CN) -> None:
        super().upgrade(cfg)
        meta = cfg.get("MODEL", {}).get("META_ARCHITECTURE", None)
        if meta == "RetinaNet":
            _rename(cfg, "MODEL.RETINANET.ANCHOR_ASPECT_RATIOS", "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS")
            _rename(cfg, "MODEL.RETINANET.ANCHOR_SIZES", "MODEL.ANCHOR_GENERATOR.SIZES")
            _del(cfg, "MODEL.RPN.ANCHOR_SIZES")
            _del(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS")
        else:
            _rename(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS", "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS")
            _rename(cfg, "MODEL.RPN.ANCHOR_SIZES", "MODEL.ANCHOR_GENERATOR.SIZES")
            _del(cfg, "MODEL.RETINANET.ANCHOR_SIZES")
            _del(cfg, "MODEL.RETINANET.ANCHOR_ASPECT_RATIOS")
        _del(cfg, "MODEL.RETINANET.ANCHOR_STRIDES")

    @classmethod
    def downgrade(cls, cfg: CN) -> None:
        super().downgrade(cfg)
        _rename(cfg, "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS", "MODEL.RPN.ANCHOR_ASPECT_RATIOS")
        _rename(cfg, "MODEL.ANCHOR_GENERATOR.SIZES", "MODEL.RPN.ANCHOR_SIZES")
        cfg.MODEL.RETINANET.ANCHOR_ASPECT_RATIOS = cfg.MODEL.RPN.ANCHOR_ASPECT_RATIOS
        cfg.MODEL.RETINANET.ANCHOR_SIZES = cfg.MODEL.RPN.ANCHOR_SIZES
        cfg.MODEL.RETINANET.ANCHOR_STRIDES = []
