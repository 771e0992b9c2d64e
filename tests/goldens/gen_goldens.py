#!/usr/bin/env python
"""Generate numeric-golden fixtures by RUNNING the reference's pure-torch
modules (VERDICT round-2 item 3).

The reference's compiled extension (detectron2._C), torchvision and fvcore
are absent in this environment, so this script installs minimal stand-ins
first — enough to import ``detectron2.modeling`` from /root/reference and
execute its *pure-torch* code paths (losses, matchers, box transforms,
anchor generation, RPN end-to-end).  The fixtures (.npz) are checked in;
tests/test_goldens.py replays them through the fsgd_tpu implementations and
asserts parity to 1e-5.

Fixture provenance mirrors the reference's own hardcoded-expectation tests:
  rpn.npz        — tests/test_rpn.py:16-74 scenario (C4 RPN, 2 images)
  fast_rcnn.npz  — tests/test_fast_rcnn.py:17-56 (+ rotated variant)
  matcher.npz    — modeling/matcher.py buckets + low-quality rescue
  box2box.npz    — modeling/box_regression.py get/apply deltas (+ rotated)

Usage: python tests/goldens/gen_goldens.py   (writes *.npz next to itself)
"""

import os
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

OUT_DIR = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("FSGD_REFERENCE", "/root/reference")


# --------------------------------------------------------------------------- #
# Minimal stand-ins for the reference's absent dependencies.
# --------------------------------------------------------------------------- #
def _smooth_l1_loss(input, target, beta, reduction="none"):
    # fvcore.nn.smooth_l1_loss semantics (pure-L1 when beta ~ 0)
    if beta < 1e-5:
        loss = torch.abs(input - target)
    else:
        n = torch.abs(input - target)
        cond = n < beta
        loss = torch.where(cond, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def _sigmoid_focal_loss(inputs, targets, alpha=-1, gamma=2, reduction="none"):
    p = torch.sigmoid(inputs)
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def _torch_nms(boxes, scores, iou_threshold):
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(int(i))
        if order.numel() == 1:
            break
        rest = order[1:]
        b = boxes[i]
        bs = boxes[rest]
        x1 = torch.maximum(b[0], bs[:, 0])
        y1 = torch.maximum(b[1], bs[:, 1])
        x2 = torch.minimum(b[2], bs[:, 2])
        y2 = torch.minimum(b[3], bs[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        a1 = (b[2] - b[0]) * (b[3] - b[1])
        a2 = (bs[:, 2] - bs[:, 0]) * (bs[:, 3] - bs[:, 1])
        iou = inter / (a1 + a2 - inter)
        order = rest[iou <= iou_threshold]
    return torch.tensor(keep, dtype=torch.int64)


def _torch_batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + 1)
    boxes_for_nms = boxes + offsets[:, None]
    return _torch_nms(boxes_for_nms, scores, iou_threshold)


def install_stubs():
    sys.path.insert(0, os.path.join(os.path.dirname(OUT_DIR), ".."))  # repo root
    from fsgd_tpu.config.cfg_node import CfgNode as _OurCN

    class CfgNode(_OurCN):
        """yacs/fvcore-compatible shim over the fsgd_tpu CfgNode."""

        def __init__(self, init_dict=None, key_list=None, new_allowed=False):
            super().__init__(init_dict, new_allowed=True)

        @classmethod
        def load_yaml_with_base(cls, filename, allow_unsafe=False):
            import yaml

            with open(filename) as f:
                return yaml.unsafe_load(f)

        def merge_from_other_cfg(self, other):
            def merge(a, b):
                for k, v in b.items():
                    if isinstance(v, dict) and isinstance(a.get(k), dict):
                        merge(a[k], v)
                    else:
                        a[k] = v

            merge(self, other)

    def module(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    # ---- fvcore ----
    fvcore = module("fvcore")
    module("fvcore.common")
    module("fvcore.common.config", CfgNode=CfgNode)

    class Registry:
        def __init__(self, name):
            self._name, self._map = name, {}

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._map[cls.__name__] = cls
                    return cls

                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    module("fvcore.common.registry", Registry=Registry)

    class HistoryBuffer:
        def __init__(self, max_length=1000000):
            self._data = []

        def update(self, value, iteration=None):
            self._data.append((value, iteration))

        def latest(self):
            return self._data[-1][0]

        def median(self, n):
            return float(np.median([x[0] for x in self._data[-n:]]))

        def avg(self, n):
            return float(np.mean([x[0] for x in self._data[-n:]]))

        def global_avg(self):
            return float(np.mean([x[0] for x in self._data]))

    module("fvcore.common.history_buffer", HistoryBuffer=HistoryBuffer)

    import time as _time

    class Timer:
        def __init__(self):
            self.reset()

        def reset(self):
            self._start = _time.perf_counter()

        def seconds(self):
            return _time.perf_counter() - self._start

        def pause(self):
            pass

        def resume(self):
            pass

        def is_paused(self):
            return False

    module("fvcore.common.timer", Timer=Timer)

    class PathHandler:
        pass

    class PathManager:
        @staticmethod
        def open(path, mode="r", **kw):
            return open(path, mode, **kw)

        @staticmethod
        def exists(path):
            return os.path.exists(path)

        @staticmethod
        def isfile(path):
            return os.path.isfile(path)

        @staticmethod
        def get_local_path(path):
            return path

        @staticmethod
        def register_handler(h):
            pass

    module("fvcore.common.file_io", PathManager=PathManager, PathHandler=PathHandler)

    class Checkpointer:
        def __init__(self, *a, **k):
            pass

    class PeriodicCheckpointer:
        def __init__(self, *a, **k):
            pass

    module("fvcore.common.checkpoint", Checkpointer=Checkpointer, PeriodicCheckpointer=PeriodicCheckpointer)

    module(
        "fvcore.nn",
        smooth_l1_loss=_smooth_l1_loss,
        sigmoid_focal_loss=_sigmoid_focal_loss,
        sigmoid_focal_loss_jit=_sigmoid_focal_loss,
        sigmoid_focal_loss_star=_sigmoid_focal_loss,
        sigmoid_focal_loss_star_jit=_sigmoid_focal_loss,
    )

    import torch.nn as nn

    def c2_xavier_fill(m):
        nn.init.kaiming_uniform_(m.weight, a=1)
        if m.bias is not None:
            nn.init.constant_(m.bias, 0)

    def c2_msra_fill(m):
        nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
        if m.bias is not None:
            nn.init.constant_(m.bias, 0)

    module("fvcore.nn.weight_init", c2_xavier_fill=c2_xavier_fill, c2_msra_fill=c2_msra_fill)
    module("fvcore.nn.precise_bn", get_bn_modules=lambda m: [], update_bn_stats=lambda *a, **k: None)

    class Transform:
        @classmethod
        def register_type(cls, data_type, func=None):
            if func is None:
                return lambda f: f
            return func

    class NoOpTransform(Transform):
        pass

    class HFlipTransform(Transform):
        def __init__(self, width=0):
            self.width = width

    class TransformList(Transform):
        def __init__(self, tfms):
            self.transforms = tfms

    class BlendTransform(Transform):
        pass

    class CropTransform(Transform):
        pass

    class VFlipTransform(Transform):
        pass

    module("fvcore.transforms")
    module(
        "fvcore.transforms.transform",
        Transform=Transform,
        TransformList=TransformList,
        NoOpTransform=NoOpTransform,
        HFlipTransform=HFlipTransform,
        VFlipTransform=VFlipTransform,
        BlendTransform=BlendTransform,
        CropTransform=CropTransform,
    )
    fvcore.common = sys.modules["fvcore.common"]
    fvcore.nn = sys.modules["fvcore.nn"]
    fvcore.transforms = sys.modules["fvcore.transforms"]

    # ---- torchvision ----
    class RoIPool:  # imported by poolers.py; never exercised by the fixtures
        def __init__(self, output_size, spatial_scale):
            self.output_size, self.spatial_scale = output_size, spatial_scale

    tv = module("torchvision")
    tv_ops = module("torchvision.ops", nms=_torch_nms, RoIPool=RoIPool)
    module("torchvision.ops.boxes", nms=_torch_nms, batched_nms=_torch_batched_nms)
    tv_ops.boxes = sys.modules["torchvision.ops.boxes"]
    tv.ops = tv_ops

    # ---- pycocotools (only structures/masks.py polygon helpers use it at
    # call time; the fixtures here never touch polygon masks)
    from fsgd_tpu.data import rle as _rle

    pct = module("pycocotools")
    pct_mask = module(
        "pycocotools.mask",
        encode=_rle.encode,
        decode=_rle.decode,
        area=_rle.area,
        toBbox=_rle.to_bbox,
    )
    pct.mask = pct_mask

    # ---- imagesize (dataset loading helper; unused by the fixtures)
    def _imagesize_get(path):
        from PIL import Image as _Img

        with _Img.open(path) as im:
            return im.size

    module("imagesize", get=_imagesize_get)

    # ---- detectron2._C (only referenced at call time by deform/rotated ops)
    module("detectron2._C")

    # the reference targets an older Pillow with the un-namespaced resample
    # constants (removed in Pillow 10)
    from PIL import Image

    for old, new in (("LINEAR", "BILINEAR"), ("CUBIC", "BICUBIC")):
        if not hasattr(Image, old):
            setattr(Image, old, getattr(Image, new))

    sys.path.insert(0, REF)


# --------------------------------------------------------------------------- #
# Fixture generators (each mirrors a reference test scenario).
# --------------------------------------------------------------------------- #
def gen_rpn():
    """tests/test_rpn.py:16-74 — C4 RPN losses + proposals, weights captured."""
    from detectron2.config import get_cfg
    from detectron2.modeling.proposal_generator.rpn import RPN
    from detectron2.layers import ShapeSpec
    from detectron2.structures import Boxes, ImageList, Instances
    from detectron2.utils.events import EventStorage

    torch.manual_seed(121)
    cfg = get_cfg()
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RPN"
    cfg.MODEL.ANCHOR_GENERATOR.NAME = "DefaultAnchorGenerator"
    cfg.MODEL.RPN.BBOX_REG_WEIGHTS = (1, 1, 1, 1)
    shapes = {"res4": ShapeSpec(channels=1024, stride=16)}
    rpn = RPN(cfg, shapes)

    num_images = 2
    images_tensor = torch.rand(num_images, 3, 20, 30)
    image_sizes = [(10, 10), (20, 30)]
    images = ImageList(images_tensor, image_sizes)
    features = {"res4": torch.rand(num_images, 1024, 1, 2)}
    gt_boxes = torch.tensor([[1, 1, 3, 3], [2, 2, 6, 6]], dtype=torch.float32)
    insts = []
    for i in range(num_images):
        inst = Instances((15, 15))
        inst.gt_boxes = Boxes(gt_boxes[i : i + 1])
        insts.append(inst)

    with EventStorage():
        proposals, losses = rpn(images, features, insts)

    head = rpn.rpn_head
    out = {
        "features": features["res4"].detach().numpy(),
        "gt_boxes": gt_boxes.numpy(),
        "image_sizes": np.array(image_sizes, np.int64),
        "conv_w": head.conv.weight.detach().numpy(),
        "conv_b": head.conv.bias.detach().numpy(),
        "obj_w": head.objectness_logits.weight.detach().numpy(),
        "obj_b": head.objectness_logits.bias.detach().numpy(),
        "delta_w": head.anchor_deltas.weight.detach().numpy(),
        "delta_b": head.anchor_deltas.bias.detach().numpy(),
        "loss_rpn_cls": losses["loss_rpn_cls"].detach().numpy(),
        "loss_rpn_loc": losses["loss_rpn_loc"].detach().numpy(),
        "anchor_sizes": np.array(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0], np.float32),
        "aspect_ratios": np.array(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0], np.float32),
        "batch_size_per_image": np.int64(cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE),
        "positive_fraction": np.float32(cfg.MODEL.RPN.POSITIVE_FRACTION),
        "smooth_l1_beta": np.float32(cfg.MODEL.RPN.SMOOTH_L1_BETA),
        "iou_thresholds": np.array(cfg.MODEL.RPN.IOU_THRESHOLDS, np.float32),
    }
    for i in range(num_images):
        out["proposal_boxes_%d" % i] = proposals[i].proposal_boxes.tensor.detach().numpy()
        out["objectness_logits_%d" % i] = proposals[i].objectness_logits.detach().numpy()
    np.savez(os.path.join(OUT_DIR, "rpn.npz"), **out)
    print("rpn.npz: loss_cls=%.10f loss_loc=%.10f" % (out["loss_rpn_cls"], out["loss_rpn_loc"]))


def gen_fast_rcnn():
    """tests/test_fast_rcnn.py:17-56 (+ rotated) — losses from explicit preds."""
    from detectron2.modeling.box_regression import Box2BoxTransform, Box2BoxTransformRotated
    from detectron2.modeling.roi_heads.fast_rcnn import FastRCNNOutputLayers, FastRCNNOutputs
    from detectron2.modeling.roi_heads.rotated_fast_rcnn import RotatedFastRCNNOutputs
    from detectron2.structures import Boxes, Instances, RotatedBoxes
    from detectron2.utils.events import EventStorage

    torch.manual_seed(132)
    box2box = Box2BoxTransform(weights=(10, 10, 5, 5))
    predictor = FastRCNNOutputLayers(8, 5, False, box_dim=4)
    feature = torch.rand(2, 8)
    logits, deltas = predictor(feature)
    proposal_boxes = torch.tensor([[0.8, 1.1, 3.2, 2.8], [2.3, 2.5, 7, 8]], dtype=torch.float32)
    gt_boxes = torch.tensor([[1, 1, 3, 3], [2, 2, 6, 6]], dtype=torch.float32)
    inst = Instances((10, 10))
    inst.proposal_boxes = Boxes(proposal_boxes)
    inst.gt_boxes = Boxes(gt_boxes)
    inst.gt_classes = torch.tensor([1, 2])
    with EventStorage():
        losses = FastRCNNOutputs(box2box, logits, deltas, [inst], 0.0).losses()

    out = {
        "logits": logits.detach().numpy(),
        "deltas": deltas.detach().numpy(),
        "proposal_boxes": proposal_boxes.numpy(),
        "gt_boxes": gt_boxes.numpy(),
        "gt_classes": np.array([1, 2], np.int64),
        "loss_cls": losses["loss_cls"].detach().numpy(),
        "loss_box_reg": losses["loss_box_reg"].detach().numpy(),
    }

    torch.manual_seed(132)
    box2box_r = Box2BoxTransformRotated(weights=(10, 10, 5, 5, 1))
    predictor_r = FastRCNNOutputLayers(8, 5, False, box_dim=5)
    feature = torch.rand(2, 8)
    logits_r, deltas_r = predictor_r(feature)
    pr = torch.tensor([[2, 1.95, 2.4, 1.7, 0], [4.65, 5.25, 4.7, 5.5, 0]], dtype=torch.float32)
    gr = torch.tensor([[2, 2, 2, 2, 0], [4, 4, 4, 4, 0]], dtype=torch.float32)
    inst = Instances((10, 10))
    inst.proposal_boxes = RotatedBoxes(pr)
    inst.gt_boxes = RotatedBoxes(gr)
    inst.gt_classes = torch.tensor([1, 2])
    with EventStorage():
        losses_r = RotatedFastRCNNOutputs(box2box_r, logits_r, deltas_r, [inst], 0.0).losses()
    out.update(
        {
            "rot_logits": logits_r.detach().numpy(),
            "rot_deltas": deltas_r.detach().numpy(),
            "rot_proposal_boxes": pr.numpy(),
            "rot_gt_boxes": gr.numpy(),
            "rot_gt_classes": np.array([1, 2], np.int64),
            "rot_loss_cls": losses_r["loss_cls"].detach().numpy(),
            "rot_loss_box_reg": losses_r["loss_box_reg"].detach().numpy(),
        }
    )
    np.savez(os.path.join(OUT_DIR, "fast_rcnn.npz"), **out)
    print(
        "fast_rcnn.npz: loss_cls=%.10f loss_box_reg=%.10f (rot %.10f/%.10f)"
        % (out["loss_cls"], out["loss_box_reg"], out["rot_loss_cls"], out["rot_loss_box_reg"])
    )


def gen_matcher():
    """modeling/matcher.py — threshold buckets + low-quality rescue."""
    from detectron2.modeling.matcher import Matcher

    rng = np.random.RandomState(7)
    quality = torch.tensor(rng.rand(5, 40).astype(np.float32))
    # a zero-quality column exercises the all-below-threshold bucket; an
    # exact-tie column exercises the rescue's tie handling
    quality[:, 0] = 0.0
    quality[2, 1] = quality[4, 1] = float(quality[:, 1].max())
    out = {"quality": quality.numpy()}
    for name, thresholds, labels, rescue in (
        ("rpn", [0.3, 0.7], [0, -1, 1], True),
        ("roi", [0.5], [0, 1], False),
        ("retina", [0.4, 0.5], [0, -1, 1], True),
    ):
        m = Matcher(thresholds, labels, allow_low_quality_matches=rescue)
        idxs, lbls = m(quality)
        out[name + "_idxs"] = idxs.numpy()
        out[name + "_labels"] = lbls.numpy()
    np.savez(os.path.join(OUT_DIR, "matcher.npz"), **out)
    print("matcher.npz:", {k: v.shape for k, v in out.items()})


def gen_box2box():
    """modeling/box_regression.py — get_deltas/apply_deltas (+ rotated)."""
    from detectron2.modeling.box_regression import Box2BoxTransform, Box2BoxTransformRotated

    rng = np.random.RandomState(3)
    src = rng.rand(16, 2) * 50
    wh = rng.rand(16, 2) * 40 + 2
    src_boxes = np.concatenate([src, src + wh], 1).astype(np.float32)
    tgt = rng.rand(16, 2) * 50
    twh = rng.rand(16, 2) * 40 + 2
    tgt_boxes = np.concatenate([tgt, tgt + twh], 1).astype(np.float32)
    deltas_in = (rng.randn(16, 4) * 0.5).astype(np.float32)

    t = Box2BoxTransform(weights=(10, 10, 5, 5))
    deltas = t.get_deltas(torch.tensor(src_boxes), torch.tensor(tgt_boxes))
    applied = t.apply_deltas(torch.tensor(deltas_in), torch.tensor(src_boxes))

    rot_src = np.concatenate(
        [rng.rand(16, 2) * 50, rng.rand(16, 2) * 40 + 2, rng.uniform(-90, 90, (16, 1))], 1
    ).astype(np.float32)
    rot_tgt = np.concatenate(
        [rng.rand(16, 2) * 50, rng.rand(16, 2) * 40 + 2, rng.uniform(-90, 90, (16, 1))], 1
    ).astype(np.float32)
    rot_deltas_in = (rng.randn(16, 5) * 0.5).astype(np.float32)
    tr = Box2BoxTransformRotated(weights=(10, 10, 5, 5, 1))
    rot_deltas = tr.get_deltas(torch.tensor(rot_src), torch.tensor(rot_tgt))
    rot_applied = tr.apply_deltas(torch.tensor(rot_deltas_in), torch.tensor(rot_src))

    np.savez(
        os.path.join(OUT_DIR, "box2box.npz"),
        src_boxes=src_boxes,
        tgt_boxes=tgt_boxes,
        deltas_in=deltas_in,
        deltas=deltas.numpy(),
        applied=applied.numpy(),
        rot_src=rot_src,
        rot_tgt=rot_tgt,
        rot_deltas_in=rot_deltas_in,
        rot_deltas=rot_deltas.numpy(),
        rot_applied=rot_applied.numpy(),
    )
    print("box2box.npz written")


# --------------------------------------------------------------------------- #
# Composed-model end-to-end goldens (VERDICT round-3 item 1).
#
# Run the reference's COMPOSED RetinaNet / Faster R-CNN (meta_arch/retinanet.py
# :107-307, meta_arch/rcnn.py:42-93) on CPU torch with fixed weights and two
# synthetic images; capture the full loss dict, the fork's 5-tuple contract
# tensors, and the final inference detections; save the state_dict as a
# detectron2-zoo .pkl.  tests/test_goldens.py loads the SAME weights through
# checkpoint/torch_loader.py and asserts fsgd_tpu reproduces losses (<=1e-3)
# and the same final boxes/classes — simultaneously validating model numerics
# AND the weight loader.
#
# Determinism notes:
#  * the backbone is a true R-50 topology (3-4-6-3 bottlenecks, FrozenBN, FPN)
#    slimmed in WIDTH only (fixture-size constraint; every layer type and
#    wiring is exercised);
#  * head weights are re-randomized with LARGER std so scores spread across
#    (0, 1) — default 0.01-std init clusters all scores, making top-k/NMS
#    selection numerically unstable across frameworks;
#  * Faster R-CNN sampling is disabled by oversizing the sampling budgets
#    (RPN 8192 >= 4092 anchors, ROI 1024 >= 259 proposals): detectron2's
#    subsample_labels then takes EVERY candidate, so torch.randperm ordering
#    cannot change the sampled set and the losses are deterministic;
#  * weights are fp16-rounded and reloaded BEFORE capture, so the .pkl holds
#    bit-identical values to what the torch run used (half-size fixture).
# --------------------------------------------------------------------------- #

_SLIM_BACKBONE = [
    "MODEL.RESNETS.STEM_OUT_CHANNELS", "32",
    "MODEL.RESNETS.RES2_OUT_CHANNELS", "32",
    "MODEL.RESNETS.WIDTH_PER_GROUP", "8",
    "MODEL.FPN.OUT_CHANNELS", "64",
]

E2E_OVERRIDES = {
    "retinanet": _SLIM_BACKBONE + [
        "MODEL.RETINANET.SCORE_THRESH_TEST", "0.05",
    ],
    "faster_rcnn": _SLIM_BACKBONE + [
        "MODEL.ROI_BOX_HEAD.FC_DIM", "256",
        "MODEL.RPN.BATCH_SIZE_PER_IMAGE", "8192",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "1024",
        "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "1000",
        "MODEL.RPN.POST_NMS_TOPK_TRAIN", "256",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "1000",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "256",
    ],
}

E2E_OVERRIDES["mask_rcnn"] = E2E_OVERRIDES["faster_rcnn"] + [
    "MODEL.ROI_MASK_HEAD.CONV_DIM", "64",
]

E2E_OVERRIDES["keypoint_rcnn"] = E2E_OVERRIDES["faster_rcnn"] + [
    "MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS", "(64, 64)",
]

E2E_OVERRIDES["cascade"] = E2E_OVERRIDES["mask_rcnn"]

E2E_OVERRIDES["panoptic"] = E2E_OVERRIDES["mask_rcnn"] + [
    "MODEL.SEM_SEG_HEAD.CONVS_DIM", "64",
]

E2E_CONFIGS = {
    "retinanet": "configs/COCO-Detection/retinanet_R_50_FPN_1x.yaml",
    "faster_rcnn": "configs/COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml",
    "mask_rcnn": "configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
    "keypoint_rcnn": "configs/COCO-Keypoints/keypoint_rcnn_R_50_FPN_1x.yaml",
    "cascade": "configs/Misc/cascade_mask_rcnn_R_50_FPN_1x.yaml",
    "panoptic": "configs/COCO-PanopticSegmentation/panoptic_fpn_R_50_1x.yaml",
}

# Two 128x128 images (divisible by every FPN stride: no ImageList padding
# ambiguity) with fixed GT.
E2E_HW = 128
E2E_GT = [
    {"boxes": [[12, 16, 60, 90], [40, 50, 100, 120], [70, 10, 120, 60]],
     "classes": [3, 17, 55]},
    {"boxes": [[5, 5, 50, 64], [60, 70, 110, 126]], "classes": [0, 41]},
]


def e2e_images():
    rng = np.random.RandomState(11)
    return rng.randint(0, 256, (2, E2E_HW, E2E_HW, 3)).astype(np.uint8)


def e2e_gt_masks():
    """(2, 3, H, W) uint8 instance bitmasks: the ellipse inscribed in each GT
    box (deterministic; rows past an image's GT count stay empty)."""
    out = np.zeros((2, 3, E2E_HW, E2E_HW), np.uint8)
    yy, xx = np.mgrid[0:E2E_HW, 0:E2E_HW].astype(np.float64) + 0.5
    for i, g in enumerate(E2E_GT):
        for j, (x1, y1, x2, y2) in enumerate(g["boxes"]):
            cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
            rx, ry = (x2 - x1) / 2.0, (y2 - y1) / 2.0
            out[i, j] = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0)
    return out


# COCO-style visibility codes (0 unlabeled, 1 labeled-invisible, 2 visible);
# the pattern is rotated per instance so every code appears in every image.
KP_VIS_PATTERN = [2, 2, 2, 1, 2, 2, 0, 2, 2, 1, 2, 2, 2, 0, 2, 2, 2]


def e2e_gt_keypoints():
    """(2, 3, 17, 3) float32 deterministic keypoints strictly inside each GT
    box (an interleaved grid; rows past an image's GT count stay zero)."""
    out = np.zeros((2, 3, 17, 3), np.float32)
    for i, g in enumerate(E2E_GT):
        for j, (x1, y1, x2, y2) in enumerate(g["boxes"]):
            for k in range(17):
                u = 0.12 + 0.76 * (((k * 7) % 17) / 16.0)
                v = 0.12 + 0.76 * (k / 16.0)
                out[i, j, k] = (
                    x1 + (x2 - x1) * u,
                    y1 + (y2 - y1) * v,
                    KP_VIS_PATTERN[(k + i + j) % 17],
                )
    return out


def _patch_roi_align():
    """Stand-in for detectron2._C.roi_align_forward: the fsgd_tpu exact JAX
    ROIAlign (already golden-pinned to the reference CUDA grids in
    tests/test_ops.py) run on CPU, forward only (goldens never backward)."""
    import importlib

    d2_ra = importlib.import_module("detectron2.layers.roi_align")

    def forward(self, input, rois):
        import jax.numpy as jnp

        from fsgd_tpu.ops.roi_align import roi_align as jax_roi_align

        feats = jnp.asarray(input.detach().numpy().transpose(0, 2, 3, 1))
        out = jax_roi_align(
            feats,
            jnp.asarray(rois.detach().numpy()),
            tuple(
                self.output_size
                if isinstance(self.output_size, (tuple, list))
                else (self.output_size, self.output_size)
            ),
            self.spatial_scale,
            self.sampling_ratio,
            self.aligned,
        )
        return torch.from_numpy(
            np.asarray(out).transpose(0, 3, 1, 2).copy()
        ).to(input.dtype)

    d2_ra.ROIAlign.forward = forward


def _spread_head_weights(model, which):
    """Re-randomize head weights with larger std (see module docstring)."""
    import torch.nn as nn

    with torch.no_grad():
        if which == "retinanet":
            torch.manual_seed(7)
            for m in model.head.modules():
                if isinstance(m, nn.Conv2d):
                    m.weight.normal_(0, 0.03)
                    m.bias.normal_(0, 0.02)
            model.head.cls_score.weight.normal_(0, 0.08)
            model.head.cls_score.bias.normal_(-2.5, 0.75)
        else:
            torch.manual_seed(8)
            h = model.proposal_generator.rpn_head
            h.conv.weight.normal_(0, 0.03)
            h.conv.bias.normal_(0, 0.02)
            h.objectness_logits.weight.normal_(0, 0.1)
            h.objectness_logits.bias.normal_(0, 0.5)
            h.anchor_deltas.weight.normal_(0, 0.03)
            h.anchor_deltas.bias.normal_(0, 0.05)
            preds = model.roi_heads.box_predictor
            preds = list(preds) if isinstance(preds, nn.ModuleList) else [preds]
            for p in preds:  # cascade: one predictor per stage
                p.cls_score.weight.normal_(0, 0.1)
                p.cls_score.bias.normal_(0, 0.5)
                p.bbox_pred.weight.normal_(0, 0.02)
                p.bbox_pred.bias.normal_(0, 0.05)
            if hasattr(model, "sem_seg_head"):
                for m in model.sem_seg_head.modules():
                    if isinstance(m, nn.Conv2d):
                        m.weight.normal_(0, 0.05)
                        if m.bias is not None:
                            m.bias.normal_(0, 0.02)
                model.sem_seg_head.predictor.weight.normal_(0, 0.1)
                model.sem_seg_head.predictor.bias.normal_(0, 0.3)
            if hasattr(model.roi_heads, "mask_head"):
                # spread mask-head weights too: default MSRA init leaves the
                # mask logits near 0 (sigmoid 0.5 everywhere), which would pin
                # nothing about the deconv/predictor layout conversions
                for m in model.roi_heads.mask_head.modules():
                    if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
                        m.weight.normal_(0, 0.05)
                        if m.bias is not None:
                            m.bias.normal_(0, 0.02)
                model.roi_heads.mask_head.predictor.weight.normal_(0, 0.1)
                model.roi_heads.mask_head.predictor.bias.normal_(0, 0.3)
            if hasattr(model.roi_heads, "keypoint_head"):
                # same rationale: near-zero heatmap logits pin nothing about
                # the conv tower / score_lowres deconv layout conversions
                for m in model.roi_heads.keypoint_head.modules():
                    if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
                        m.weight.normal_(0, 0.05)
                        if m.bias is not None:
                            m.bias.normal_(0, 0.02)
                model.roi_heads.keypoint_head.score_lowres.weight.normal_(0, 0.12)
                model.roi_heads.keypoint_head.score_lowres.bias.normal_(0, 0.3)


def _calibrate_frozen_bn(model, images_tensor):
    """Set every FrozenBatchNorm2d's running stats from a real forward pass.

    Random-init FrozenBN is the identity, so activation magnitude explodes
    through 50 conv layers (losses ~1e5, all scores ~0).  A forward PRE-hook
    assigns each norm's running_mean/var from its actual input before the
    module executes, so downstream modules see calibrated outputs within the
    same pass — one pass normalizes the whole backbone (PreciseBN-style).
    The stats live in state_dict, so the .pkl carries them to fsgd_tpu."""
    from detectron2.layers.batch_norm import FrozenBatchNorm2d

    handles = []

    def hook(mod, inp):
        x = inp[0].detach()
        mod.running_mean.copy_(x.mean(dim=(0, 2, 3)))
        mod.running_var.copy_(x.var(dim=(0, 2, 3), unbiased=False).clamp(min=1e-4))

    for m in model.modules():
        if isinstance(m, FrozenBatchNorm2d):
            handles.append(m.register_forward_pre_hook(hook))
    with torch.no_grad():
        model.backbone(images_tensor)
    for h in handles:
        h.remove()


def _save_weights_fp16_roundtrip(model, path):
    """fp16-round the weights, reload them into the torch model, and save a
    detectron2-zoo-format .pkl holding the exact values the capture used."""
    import pickle

    sd = {}
    for k, v in model.state_dict().items():
        if "cell_anchors" in k or "pixel" in k:
            continue  # derived buffers; both frameworks recompute in fp32
        sd[k] = v.detach().numpy().astype(np.float16)
    model.load_state_dict(
        {k: torch.from_numpy(v.astype(np.float32)) for k, v in sd.items()},
        strict=False,
    )
    with open(path, "wb") as f:
        pickle.dump(
            {"model": sd, "__author__": "fsgd_goldens", "matching_heuristics": True},
            f,
        )


def e2e_gt_sem_seg(num_stuff=54, ignore=255):
    """(2, H, W) int64 stuff labels: deterministic quadrant fill + an
    ignore-value strip, so every loss branch (valid + ignored pixels) runs."""
    out = np.zeros((2, E2E_HW, E2E_HW), np.int64)
    half = E2E_HW // 2
    labels = [[3, 11, 27, 40], [0, 7, 33, 52]]
    for i in range(2):
        a, b, c, d = labels[i]
        out[i, :half, :half] = a % num_stuff
        out[i, :half, half:] = b % num_stuff
        out[i, half:, :half] = c % num_stuff
        out[i, half:, half:] = d % num_stuff
        out[i, 60:68, :] = ignore
    return out


def _e2e_batched_inputs(with_masks=False, with_keypoints=False, with_sem_seg=False):
    from detectron2.structures import Boxes, Instances

    images = e2e_images()
    masks = e2e_gt_masks() if with_masks else None
    kpts = e2e_gt_keypoints() if with_keypoints else None
    sem = e2e_gt_sem_seg() if with_sem_seg else None
    batched = []
    for i in range(2):
        inst = Instances((E2E_HW, E2E_HW))
        inst.gt_boxes = Boxes(torch.tensor(E2E_GT[i]["boxes"], dtype=torch.float32))
        n = len(E2E_GT[i]["classes"])
        if with_keypoints:
            # keypoint configs train a single (person) class
            inst.gt_classes = torch.zeros(n, dtype=torch.int64)
            from detectron2.structures import Keypoints

            inst.gt_keypoints = Keypoints(torch.from_numpy(kpts[i, :n]))
        else:
            inst.gt_classes = torch.tensor(E2E_GT[i]["classes"], dtype=torch.int64)
        if with_masks:
            from detectron2.structures import BitMasks

            inst.gt_masks = BitMasks(torch.from_numpy(masks[i, :n].astype(bool)))
        item = {
            "image": torch.as_tensor(
                images[i].transpose(2, 0, 1).astype(np.float32)
            ),
            "height": E2E_HW,
            "width": E2E_HW,
            "instances": inst,
        }
        if with_sem_seg:
            item["sem_seg"] = torch.from_numpy(sem[i])
        batched.append(item)
    return batched


def gen_model_e2e(which):
    import json as _json

    from detectron2.config import get_cfg
    from detectron2.modeling import build_model
    from detectron2.utils.events import EventStorage

    _patch_roi_align()
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF, E2E_CONFIGS[which]))
    cfg.merge_from_list(list(E2E_OVERRIDES[which]))
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.WEIGHTS = ""

    torch.manual_seed(20)
    model = build_model(cfg)
    images = e2e_images().astype(np.float32)  # (2, H, W, 3)
    norm_in = model.normalizer(torch.as_tensor(images.transpose(0, 3, 1, 2)))
    _calibrate_frozen_bn(model, norm_in)
    _spread_head_weights(model, which)
    weights_path = os.path.join(OUT_DIR, "%s_e2e_weights.pkl" % which)
    _save_weights_fp16_roundtrip(model, weights_path)

    out = {
        "images": e2e_images(),
        "overrides": np.array(_json.dumps(E2E_OVERRIDES[which])),
        "gt": np.array(_json.dumps(E2E_GT)),
    }

    # ---- training forward: full loss dict (+ fork 5-tuple for RetinaNet)
    model.train()
    with EventStorage(), torch.no_grad():
        if which == "retinanet":
            from detectron2.modeling.meta_arch.retinanet import permute_to_N_HWA_K

            images_t, preds, gt_classes, mask, losses = model(_e2e_batched_inputs())
            out["gt_classes"] = gt_classes.numpy()
            out["picky_mask"] = mask.numpy()
            out["pred_class_logits"] = torch.cat(
                [permute_to_N_HWA_K(x, cfg.MODEL.RETINANET.NUM_CLASSES)
                 for x in preds["pred_class_logits"]], dim=1
            ).numpy()
            out["pred_proposal_deltas"] = torch.cat(
                [permute_to_N_HWA_K(x, 4) for x in preds["pred_proposal_deltas"]],
                dim=1,
            ).numpy()
        else:
            batched = _e2e_batched_inputs(
                with_masks=which in ("mask_rcnn", "cascade", "panoptic"),
                with_keypoints=(which == "keypoint_rcnn"),
                with_sem_seg=(which == "panoptic"),
            )
            if which in ("mask_rcnn", "cascade", "panoptic"):
                out["gt_masks"] = e2e_gt_masks()
            if which == "panoptic":
                out["gt_sem_seg"] = e2e_gt_sem_seg()
            if which == "keypoint_rcnn":
                out["gt_keypoints"] = e2e_gt_keypoints()
            if which in ("faster_rcnn", "mask_rcnn", "keypoint_rcnn"):
                # diagnostic capture: train-mode RPN proposals + ROI stats
                images_il = model.preprocess_image(batched)
                gt_instances = [x["instances"] for x in batched]
                feats = model.backbone(images_il.tensor)
                proposals, _ = model.proposal_generator(images_il, feats, gt_instances)
                for i, p in enumerate(proposals):
                    out["rpn_prop_boxes_%d" % i] = p.proposal_boxes.tensor.numpy()
                    out["rpn_prop_logits_%d" % i] = p.objectness_logits.numpy()
                sampled = model.roi_heads.label_and_sample_proposals(proposals, gt_instances)
                out["roi_sampled_count"] = np.array(
                    [len(p) for p in sampled], np.int64
                )
                out["roi_fg_count"] = np.array(
                    [int((p.gt_classes != model.roi_heads.num_classes).sum()) for p in sampled],
                    np.int64,
                )
            losses = model(batched)
    for k, v in losses.items():
        out["loss_" + k if not k.startswith("loss") else k] = v.detach().numpy()

    # ---- inference: final detections per image
    model.eval()
    with torch.no_grad():
        if which == "panoptic":
            # PanopticFPN.forward (eval) postprocesses in place; input frame
            # == output frame (128) so boxes/sem-seg stay in-frame.  The
            # panoptic COMBINE step is covered by the PQ convergence gate +
            # its own unit tests (mask pasting binarization is fragile
            # cross-framework); here we pin sem_seg logits + detections.
            results = model(_e2e_batched_inputs(with_sem_seg=True))
            processed = results
            for i, r in enumerate(results):
                out["sem_seg_logits_%d" % i] = r["sem_seg"].numpy()
        elif which in ("mask_rcnn", "keypoint_rcnn", "cascade"):
            # do_postprocess=False: capture the RAW 28x28 per-detection mask
            # probabilities (a pure function of the weights — the tight pin
            # for the deconv/predictor layout conversions) instead of pasted
            # full-image bitmasks whose 0.5-binarization is fragile across
            # frameworks.  Input frame == output frame (128x128), so boxes
            # match the postprocessed ones up to clipping.  Keypoints come
            # out as (N, 17, 3) = (x, y, prob) in the input frame.
            processed_raw = model.inference(_e2e_batched_inputs(), do_postprocess=False)
            processed = [{"instances": r} for r in processed_raw]
        else:
            result = model(_e2e_batched_inputs())
            processed = result[3] if which == "retinanet" else result  # fork 4-tuple
    for i, r in enumerate(processed):
        inst = r["instances"]
        out["det_boxes_%d" % i] = inst.pred_boxes.tensor.numpy()
        out["det_scores_%d" % i] = inst.scores.numpy()
        out["det_classes_%d" % i] = inst.pred_classes.numpy()
        if inst.has("pred_masks") and which != "panoptic":
            out["det_masks_%d" % i] = inst.pred_masks.numpy()[:, 0]  # (N, 28, 28) probs
        if inst.has("pred_keypoints"):
            out["det_keypoints_%d" % i] = inst.pred_keypoints.numpy()  # (N, 17, 3)
    if which == "keypoint_rcnn":
        # ALSO capture the raw per-detection heatmap logits: random-weight
        # heatmaps are nearly flat, so the decoded argmax is numerically
        # unstable across frameworks — the logits are the meaningful pin
        # (the decode convention is pinned separately by gen_kp_decode on
        # peaked maps).
        captured = []
        h = model.roi_heads.keypoint_head.register_forward_hook(
            lambda mod, inp, out_: captured.append(out_.detach().numpy())
        )
        with torch.no_grad():
            model.inference(_e2e_batched_inputs(), do_postprocess=False)
        h.remove()
        logits = np.concatenate(captured, axis=0)  # (sum N_i, K, S, S)
        n0 = len(out["det_scores_0"])
        out["det_kp_logits_0"] = logits[:n0]
        out["det_kp_logits_1"] = logits[n0:]

    np.savez(os.path.join(OUT_DIR, "%s_e2e.npz" % which), **out)
    print(
        "%s_e2e.npz: losses={%s} dets=%s"
        % (
            which,
            ", ".join("%s=%.6f" % (k, float(v)) for k, v in losses.items()),
            [int(out["det_scores_%d" % i].shape[0]) for i in range(2)],
        )
    )


def gen_kp_decode():
    """Golden for the keypoint heatmap decode convention on PEAKED maps.

    heatmaps_to_keypoints (reference structures/keypoints.py:142-218) bicubic-
    upsamples each map to the per-roi ceil(h)xceil(w) size before the argmax;
    fsgd_tpu uses a static 4x upsample.  On peaked maps both land within a
    fraction of one native bin of the true mode — that is the contract this
    golden pins (on flat/noisy maps the argmax is ill-defined by nature)."""
    from detectron2.structures.keypoints import heatmaps_to_keypoints

    rng = np.random.RandomState(17)
    N, K, S = 12, 17, 56
    boxes = np.zeros((N, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 60, N)
    boxes[:, 1] = rng.uniform(0, 60, N)
    # half the rois LARGER than the heatmap (the reference then upsamples and
    # peak amplitudes survive — where prob values are comparable), half
    # smaller (reference downsamples; only positions are comparable there)
    boxes[: N // 2, 2] = boxes[: N // 2, 0] + rng.uniform(60, 120, N // 2)
    boxes[: N // 2, 3] = boxes[: N // 2, 1] + rng.uniform(60, 120, N // 2)
    boxes[N // 2 :, 2] = boxes[N // 2 :, 0] + rng.uniform(15, 55, N - N // 2)
    boxes[N // 2 :, 3] = boxes[N // 2 :, 1] + rng.uniform(15, 55, N - N // 2)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    maps = np.zeros((N, K, S, S), np.float32)
    centers = rng.uniform(4, S - 4, (N, K, 2)).astype(np.float32)
    sig = rng.uniform(1.5, 4.0, (N, K)).astype(np.float32)
    for i in range(N):
        for k in range(K):
            cx, cy = centers[i, k]
            maps[i, k] = 6.0 * np.exp(
                -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig[i, k] ** 2)
            )
    maps += 0.05 * rng.randn(N, K, S, S).astype(np.float32)
    ref = heatmaps_to_keypoints(
        torch.from_numpy(maps), torch.from_numpy(boxes)
    ).numpy()  # (N, K, 4) = x, y, logit, prob
    np.savez(os.path.join(OUT_DIR, "kp_decode.npz"), maps=maps, boxes=boxes, ref=ref)
    print("kp_decode.npz:", ref.shape)


def gen_gambler():
    """Gambler numerics pinned against the reference's pure-torch code
    (ImbalanceDetection/imbalancedetection/gambler_heads.py:104-253 for the
    loss functions, :431-630 for the composed LayeredUnetGambler).

    Fixtures:
      gambler_loss.npz    — calc_cls_loss (all modes) + calc_gambler_loss
                            over every layout code (L_BAHW / L_B1HW /
                            L_BAHW_extendtobatch / B1HW / BCHW / BAHW) +
                            get_loss_upper_bound
      gambler_e2e.npz     — composed LayeredUnetGambler forward: loss dict,
                            masked betting maps, flattened weights, and the
                            D-phase gradient d(gambler_loss)/d(logits) plus
                            two G-phase parameter gradients
      gambler_weights.pkl — the torch state_dict (fp16 roundtrip) the capture
                            used
    """
    import pickle

    sys.path.insert(0, os.path.join(REF, "ImbalanceDetection"))
    from detectron2.config import get_cfg, set_global_cfg
    from detectron2.utils.events import EventStorage
    from imbalancedetection.config import add_gambler_config
    from imbalancedetection import gambler_heads as GH

    rng = np.random.RandomState(7)
    N, K, A = 2, 4, 3
    HS = [32, 16, 8, 4, 2]
    R = sum(h * h * A for h in HS)

    cfg = get_cfg()
    add_gambler_config(cfg)
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.GAMBLER_HEAD.NAME = "LayeredUnetGambler"
    cfg.MODEL.GAMBLER_HEAD.GAMBLER_OUTPUT = "L_BAHW"
    cfg.MODEL.GAMBLER_HEAD.NUM_CLASSES = K
    cfg.MODEL.GAMBLER_HEAD.GAMBLER_IN_CHANNELS = A * K
    cfg.MODEL.GAMBLER_HEAD.GAMBLER_OUT_CHANNELS = A
    cfg.MODEL.GAMBLER_HEAD.IN_LAYERS = HS
    cfg.MODEL.GAMBLER_HEAD.FIXED_CHANNEL = 16
    cfg.MODEL.GAMBLER_HEAD.BILINEAR_UPSAMPLING = False  # UpCat: deconv only
    cfg.MODEL.GAMBLER_HEAD.INIT = "default"
    cfg.MODEL.GAMBLER_HEAD.GAMBLER_TEMPERATURE = 0.03
    cfg.MODEL.GAMBLER_HEAD.GAMBLER_LOSS_MODE = "sigmoid"
    cfg.MODEL.RETINANET.NUM_CLASSES = K
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16, 32, 64]]  # num_scale == A == 3
    set_global_cfg(cfg)

    out = {}

    # ---- calc_cls_loss: every mode
    pred = rng.randn(64, K).astype(np.float32) * 2
    tgt = (rng.rand(64, K) < 0.25).astype(np.float32)
    out["cls_pred"], out["cls_tgt"] = pred, tgt
    for name, mode, alpha, gamma in (
        ("focal_a", "focal", 0.25, 2.0),
        ("focal_na", "focal", -1.0, 2.0),
        ("sigmoid", "sigmoid", -1.0, 2.0),
    ):
        out["cls_loss_" + name] = GH.calc_cls_loss(
            torch.from_numpy(pred), torch.from_numpy(tgt), mode, alpha, gamma
        ).numpy()

    # ---- calc_gambler_loss: layered codes (5 levels)
    valid_loss = np.abs(rng.randn(N * R, K)).astype(np.float32)
    out["g_valid_loss"] = valid_loss
    gh = GH.GamblerHeads(cfg)
    for code, wch in (("L_BAHW", A), ("L_B1HW", 1), ("L_BAHW_extendtobatch", A)):
        w_levels = [
            np.abs(rng.randn(N, wch, h, h)).astype(np.float32) for h in HS
        ]
        cfg.MODEL.GAMBLER_HEAD.GAMBLER_OUTPUT = code
        for norm in (True, False):
            tag = "%s_%s" % (code, "n" if norm else "un")
            gl, nakhw, wflat = GH.calc_gambler_loss(
                torch.from_numpy(valid_loss.copy()),
                [torch.from_numpy(w.copy()) for w in w_levels],
                N, [h for h in HS], [h for h in HS], HS, gh,
                normalize_w=norm, num_classes=K, gambler_output=code, gamma=1.0,
            )
            out["gl_%s" % tag] = gl.detach().numpy()
            out["gw_%s" % tag] = wflat.detach().numpy()
            for i, l in enumerate(nakhw):
                out["gn_%s_%d" % (tag, i)] = l.numpy()
        for i, w in enumerate(w_levels):
            out["w_%s_%d" % (code, i)] = w
    out["ub"] = GH.get_loss_upper_bound(
        [torch.from_numpy(out["gn_L_BAHW_n_%d" % i]) for i in range(5)], N, 0.03, 2200.0
    ).numpy()

    # ---- calc_gambler_loss: single-level codes.  NOTE: the reference passes
    # num_classes positionally into reverse_...'s num_scale slot here
    # (gambler_heads.py:162-165), so these paths only reshape consistently
    # when num_classes == 80 (the signature default) — pin them at K=80.
    H1, K1 = 16, 80
    vl1 = np.abs(rng.randn(N * H1 * H1 * A, K1)).astype(np.float32)
    out["g1_valid_loss"] = vl1
    for code, wch in (("B1HW", 1), ("BCHW", K1), ("BAHW", A)):
        w = np.abs(rng.randn(N, wch, H1, H1)).astype(np.float32)
        cfg.MODEL.GAMBLER_HEAD.GAMBLER_OUTPUT = code
        gl, nakhw, wflat = GH.calc_gambler_loss(
            torch.from_numpy(vl1.copy()), torch.from_numpy(w.copy()),
            N, H1, H1, [H1], gh,
            normalize_w=True, num_classes=K1, gambler_output=code, gamma=1.0,
        )
        out["gl1_%s" % code] = gl.detach().numpy()
        out["gw1_%s" % code] = wflat.detach().numpy()
        out["gn1_%s" % code] = nakhw[0].numpy()
        out["w1_%s" % code] = w
    cfg.MODEL.GAMBLER_HEAD.GAMBLER_OUTPUT = "L_BAHW"
    np.savez(os.path.join(OUT_DIR, "gambler_loss.npz"), **out)
    print("gambler_loss.npz:", len(out), "arrays")

    # ---- composed LayeredUnetGambler (both loss modes share one weight set)
    torch.manual_seed(3)
    model = GH.LayeredUnetGambler(cfg)
    model.train()
    sd = {k: v.detach().numpy().astype(np.float16) for k, v in model.state_dict().items()}
    model.load_state_dict(
        {k: torch.from_numpy(v.astype(np.float32)) for k, v in sd.items()}, strict=True
    )
    with open(os.path.join(OUT_DIR, "gambler_weights.pkl"), "wb") as f:
        pickle.dump(sd, f)

    images = rng.uniform(-2, 2, (N, 3, 256, 256)).astype(np.float32)
    logits = [(rng.randn(N, A * K, h, h) * 2).astype(np.float32) for h in HS]
    gt = rng.randint(-1, K + 1, (N, R)).astype(np.int64)
    mask = (rng.rand(N, R) > 0.3).astype(np.float32)

    e2e = {"images": images, "gt_classes": gt, "mask": mask}
    for i, l in enumerate(logits):
        e2e["logits_%d" % i] = l

    t_logits = [torch.from_numpy(l.copy()).requires_grad_(True) for l in logits]
    with EventStorage():
        loss_dict, weights, betting_map = model(
            torch.from_numpy(images.copy()),
            t_logits,
            torch.from_numpy(gt.copy()),
            torch.from_numpy(mask.copy()),
            detach_pred=False,
        )
    e2e["gambler_loss"] = loss_dict["gambler_loss"].detach().numpy()
    e2e["loss_before_weighting"] = loss_dict["loss_before_weighting"].detach().numpy()
    e2e["lower_bound"] = (
        -GH.get_loss_upper_bound(loss_dict["NAKHW_loss"], N, 0.03, 2200.0).numpy()
    )
    for i, l in enumerate(loss_dict["NAKHW_loss"]):
        e2e["nakhw_%d" % i] = l.numpy()
    e2e["weights_flat"] = weights.numpy()
    for i, b in enumerate(betting_map):  # masked bets, [p3..p7]
        e2e["bets_%d" % i] = b.detach().numpy()
    loss_dict["gambler_loss"].backward()
    for i, t in enumerate(t_logits):
        e2e["dlogits_%d" % i] = t.grad.numpy()
    e2e["dpost_p3_w"] = model.postgamblerpredictions.p3.weight.grad.numpy()
    e2e["dpre_w"] = model.pregamblerpredictions.model[0].weight.grad.numpy()
    np.savez(os.path.join(OUT_DIR, "gambler_e2e.npz"), **e2e)
    print(
        "gambler_e2e.npz: gambler_loss=%.6f before_weighting=%.6f"
        % (float(e2e["gambler_loss"]), float(e2e["loss_before_weighting"]))
    )


def main():
    install_stubs()
    gen_box2box()
    gen_matcher()
    gen_fast_rcnn()
    gen_rpn()
    gen_model_e2e("retinanet")
    gen_model_e2e("faster_rcnn")
    gen_model_e2e("mask_rcnn")
    gen_model_e2e("keypoint_rcnn")
    gen_model_e2e("cascade")
    gen_model_e2e("panoptic")
    gen_kp_decode()
    gen_gambler()


if __name__ == "__main__":
    main()
