"""Load torch/detectron2/Caffe2 zoo checkpoints into fsgd_tpu param pytrees.

Role of the reference's detectron2/checkpoint/c2_model_loading.py:12-313 +
detection_checkpoint.py:26-59:

* ``.pkl`` files that are not in Detectron2-zoo format (no ``__author__``) are
  Caffe2/Detectron1 blobs: their names are rewritten to detectron2 layout
  (``convert_c2_names``) including the background-class tensor surgery on
  ``cls_score``/``bbox_pred``/``mask_head.predictor``.
* Checkpoint keys are matched to model parameters by *complete-suffix* match
  (reference ``align_and_update_state_dicts``), so ImageNet backbones whose
  keys lack the ``backbone.(bottom_up.)`` prefix still land on the right
  leaves.
* ``running_var`` tensors are loaded as ``var - eps`` (eps 1e-5): the
  reference's FrozenBatchNorm2d load hook subtracts eps from metadata-less
  state dicts — every ``.pkl`` zoo file — so the torch model actually runs
  with ``var - eps`` (reference detectron2/layers/batch_norm.py:42,62-75;
  its forward then adds eps back).  Skipping this shifts every BN scale by
  ~eps/2var and measurably breaks full-model parity (tests/test_goldens.py
  composed-model goldens caught it at the stem).
* Layout conversions torch->flax: conv NCHW->NHWC kernels, deconv, fc
  transpose, and a CHW->HWC input permutation for every fc that flattens
  pooled feature maps (``box_head(.k).fc1`` incl. cascade stages).

Unmatched parameters keep their initialization and are reported, matching the
reference's logging behavior.
"""

from __future__ import annotations

import logging
import pickle
import re
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _load_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], bool]:
    """Returns (name->array, is_caffe2)."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        if isinstance(data, dict) and "model" in data and "__author__" in data:
            # Detectron2 model-zoo format (detection_checkpoint.py:30-33)
            data = data["model"]
            is_c2 = False
        else:
            # Caffe2 / Detectron1 blobs (detection_checkpoint.py:34-40)
            if isinstance(data, dict) and "blobs" in data:
                data = data["blobs"]
            data = {k: v for k, v in data.items() if not k.endswith("_momentum")}
            is_c2 = True
        return (
            {k: np.asarray(v) for k, v in data.items() if isinstance(v, np.ndarray)},
            is_c2,
        )
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        data = data["model"]
    return {k: np.asarray(v.numpy()) for k, v in data.items() if hasattr(v, "numpy")}, False


# ---------------------------------------------------------------------------
# Caffe2/Detectron1 -> detectron2 name conversion
# ---------------------------------------------------------------------------

# Ordered rename pipeline; each entry is (regex, replacement), applied with
# re.sub to every key.  Semantics follow c2_model_loading.py:12-174.
_C2_RENAME_STEPS = (
    # suffix markers (after _ -> . substitution)
    (r"\.b$", ".bias"),
    (r"\.w$", ".weight"),
    # batch/group norm stats -> "norm"
    (r"bn\.s$", "norm.weight"),
    (r"bn\.bias$", "norm.bias"),
    (r"bn\.rm$", "norm.running_mean"),
    (r"bn\.running\.mean$", "norm.running_mean"),
    (r"bn\.riv$", "norm.running_var"),
    (r"bn\.running\.var$", "norm.running_var"),
    (r"bn\.gamma$", "norm.weight"),
    (r"bn\.beta$", "norm.bias"),
    (r"gn\.s$", "norm.weight"),
    (r"gn\.bias$", "norm.bias"),
    # stem
    (r"^res\.conv1\.norm\.", "conv1.norm."),
    (r"^conv1\.", "stem.conv1."),
    # bottleneck branches
    (r"\.branch1\.", ".shortcut."),
    (r"\.branch2a\.", ".conv1."),
    (r"\.branch2b\.", ".conv2."),
    (r"\.branch2c\.", ".conv3."),
    # DensePose heads
    (r"^body\.conv\.fcn", "body_conv_fcn"),
    (r"AnnIndex\.lowres", "ann_index_lowres"),
    (r"Index\.UV\.lowres", "index_uv_lowres"),
    (r"U\.lowres", "u_lowres"),
    (r"V\.lowres", "v_lowres"),
    # RPN (FPN level-2 shared conv appears as "fpn2")
    (r"conv\.rpn\.fpn2", "proposal_generator.rpn_head.conv"),
    (r"conv\.rpn", "proposal_generator.rpn_head.conv"),
    (r"rpn\.bbox\.pred\.fpn2", "proposal_generator.rpn_head.anchor_deltas"),
    (r"rpn\.cls\.logits\.fpn2", "proposal_generator.rpn_head.objectness_logits"),
    (r"rpn\.bbox\.pred", "proposal_generator.rpn_head.anchor_deltas"),
    (r"rpn\.cls\.logits", "proposal_generator.rpn_head.objectness_logits"),
    # Fast R-CNN box head
    (r"^bbox\.pred", "bbox_pred"),
    (r"^cls\.score", "cls_score"),
    (r"^fc6\.", "box_head.fc1."),
    (r"^fc7\.", "box_head.fc2."),
    (r"^head\.conv", "box_head.conv"),
    # Mask R-CNN mask head
    (r"\.\[mask\]\.fcn", "mask_head.mask_fcn"),
    (r"^\.mask\.fcn", "mask_head.mask_fcn"),
    (r"mask\.fcn\.logits", "mask_head.predictor"),
    (r"conv5\.mask", "mask_head.deconv"),
    # Keypoint R-CNN head
    (r"conv\.fcn", "roi_heads.keypoint_head.conv_fcn"),
    (r"kps\.score\.lowres", "roi_heads.keypoint_head.score_lowres"),
    (r"kps\.score\.", "roi_heads.keypoint_head.score."),
)


def _convert_one_c2_name(key: str) -> str:
    # hard-coded legacy aliases, then underscores become dots
    key = {"pred_b": "linear_b", "pred_w": "linear_w"}.get(key, key)
    key = key.replace("_", ".")
    for pat, repl in _C2_RENAME_STEPS:
        key = re.sub(pat, repl, key)
    # FPN lateral/output convs (c2_model_loading.py:132-154):
    #   fpn.inner.res<S>.<b>.sum(.lateral)(.norm).{weight,bias} -> fpn_lateral<S>
    #   fpn.res<S>.<b>.sum(.norm).{weight,bias}                 -> fpn_output<S>
    m = re.match(r"^fpn\.inner\.res(\d+)\.\d+\.sum(?:\.lateral)?(\.norm)?\.(weight|bias)$", key)
    if m:
        return "fpn_lateral{}{}.{}".format(m.group(1), m.group(2) or "", m.group(3))
    m = re.match(r"^fpn\.res(\d+)\.\d+\.sum(\.norm)?\.(weight|bias)$", key)
    if m:
        return "fpn_output{}{}.{}".format(m.group(1), m.group(2) or "", m.group(3))
    return key


def convert_c2_names(weights: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename Caffe2 blobs to detectron2 names + background-class surgery.

    The Caffe2 classifiers put the background class first; detectron2 puts it
    last (cls_score) or drops it (bbox_pred / mask predictor)
    (c2_model_loading.py:182-206).  Tensors here are torch-layout (out-major),
    so the surgery operates on axis 0.
    """
    renamed: Dict[str, np.ndarray] = {}
    for orig in sorted(weights.keys()):
        new = _convert_one_c2_name(orig)
        if new in renamed:
            raise ValueError("Caffe2 rename collision: {} -> {}".format(orig, new))
        v = weights[orig]
        if new.startswith("bbox_pred."):
            v = v[4:]  # drop background-class deltas
        elif new.startswith("mask_head.predictor."):
            v = v[1:]  # drop background-class mask
        elif new.startswith("cls_score."):
            v = np.concatenate([v[1:], v[:1]], axis=0)  # bg class 0 -> last
        renamed[new] = v
    return renamed


_NORM_LEAVES = {"weight": "weight", "bias": "bias", "running_mean": "running_mean", "running_var": "running_var"}


def _flax_path_to_torch_name(parts) -> Optional[str]:
    """Translate a flax param path (list of scope names + leaf) into the
    detectron2 state-dict name.  Returns None when no mapping exists."""
    leaf = parts[-1]
    scopes = parts[:-1]
    p = "/".join(scopes)
    wb = "weight" if leaf == "kernel" else "bias"

    def norm_leaf():
        return _NORM_LEAVES.get(leaf)

    # backbone prefix: FPN backbones nest the ResNet under "bottom_up"; C4/DC5
    # backbones are the ResNet itself (d2 names them backbone.res4... directly)
    bu = "backbone.bottom_up." if "bottom_up" in scopes else "backbone."

    # ---- ResNet bottom-up -------------------------------------------------
    m = re.search(r"(?:^|/)stem/stem_conv1/(conv|FrozenBatchNorm_0)$", p)
    if m and "roi_heads" not in scopes:
        base = bu + "stem.conv1"
        return base + (".weight" if m.group(1) == "conv" else ".norm." + norm_leaf())
    m = re.search(r"(?:^|/)res(\d)_block(\d+)/(conv\d|shortcut)/(conv|FrozenBatchNorm_0)$", p)
    if m and "roi_heads" not in scopes:
        stage, block, sub, kind = m.groups()
        base = "{}res{}.{}.{}".format(bu, stage, block, sub)
        return base + (".weight" if kind == "conv" else ".norm." + norm_leaf())

    # ---- FPN ----------------------------------------------------------------
    m = re.search(r"backbone/fpn_lateral_res(\d)$", p)
    if m:
        return "backbone.fpn_lateral{}.{}".format(m.group(1), wb)
    m = re.search(r"backbone/fpn_output_res(\d)$", p)
    if m:
        return "backbone.fpn_output{}.{}".format(m.group(1), wb)
    m = re.search(r"backbone/fpn_p(\d)$", p)
    if m:
        return "backbone.top_block.p{}.{}".format(m.group(1), wb)

    # ---- RetinaNet head -----------------------------------------------------
    m = re.search(r"head/cls_tower(\d+)$", p)
    if m:
        return "head.cls_subnet.{}.{}".format(2 * int(m.group(1)), wb)
    m = re.search(r"head/box_tower(\d+)$", p)
    if m:
        return "head.bbox_subnet.{}.{}".format(2 * int(m.group(1)), wb)
    m = re.search(r"head/(cls_score|bbox_pred)$", p)
    if m:
        return "head.{}.{}".format(m.group(1), wb)

    # ---- RPN head -----------------------------------------------------------
    m = re.search(r"(?:proposal_generator/)?(conv|objectness_logits|anchor_deltas)$", p)
    if m and ("proposal_generator" in p or p in ("conv", "objectness_logits", "anchor_deltas")):
        return "proposal_generator.rpn_head.{}.{}".format(m.group(1), wb)

    # ---- ROI heads ----------------------------------------------------------
    # cascade per-stage heads: box_head_<k>/fc<i> -> roi_heads.box_head.<k>.fc<i+1>
    m = re.search(r"roi_heads/box_head_(\d+)/fc(\d+)$", p)
    if m:
        return "roi_heads.box_head.{}.fc{}.{}".format(m.group(1), int(m.group(2)) + 1, wb)
    m = re.search(r"roi_heads/box_head_(\d+)/conv(\d+)$", p)
    if m:
        return "roi_heads.box_head.{}.conv{}.{}".format(m.group(1), int(m.group(2)) + 1, wb)
    m = re.search(r"roi_heads/box_predictor_(\d+)/(cls_score|bbox_pred)$", p)
    if m:
        return "roi_heads.box_predictor.{}.{}.{}".format(m.group(1), m.group(2), wb)
    m = re.search(r"roi_heads/box_head/fc(\d+)$", p)
    if m:
        return "roi_heads.box_head.fc{}.{}".format(int(m.group(1)) + 1, wb)
    m = re.search(r"roi_heads/box_head/conv(\d+)$", p)
    if m:
        return "roi_heads.box_head.conv{}.{}".format(int(m.group(1)) + 1, wb)
    m = re.search(r"roi_heads/box_predictor/(cls_score|bbox_pred)$", p)
    if m:
        return "roi_heads.box_predictor.{}.{}".format(m.group(1), wb)
    m = re.search(r"roi_heads/mask_head/(mask_fcn\d+|deconv|predictor)$", p)
    if m:
        return "roi_heads.mask_head.{}.{}".format(m.group(1), wb)
    m = re.search(r"roi_heads/keypoint_head/(conv_fcn\d+|score_lowres)$", p)
    if m:
        return "roi_heads.keypoint_head.{}.{}".format(m.group(1), wb)
    # Res5ROIHeads shared stage: roi_heads/res5/res5_block<i>/...
    m = re.search(r"roi_heads/res5/res5_block(\d+)/(conv\d|shortcut)/(conv|FrozenBatchNorm_0)$", p)
    if m:
        block, sub, kind = m.groups()
        base = "roi_heads.res5.{}.{}".format(block, sub)
        return base + (".weight" if kind == "conv" else ".norm." + norm_leaf())

    # ---- Semantic seg head ----------------------------------------------------
    # reference scale heads are registered under the FEATURE name (p2..p5) with
    # Sequential indices 0,2,4 for convs (odd slots are Upsample modules) and
    # the norm as the Conv2d wrapper's .norm (semantic_seg.py:113-139)
    m = re.search(r"sem_seg_head/l(\d+)_conv(\d+)$", p)
    if m:
        return "sem_seg_head.p{}.{}.{}".format(
            2 + int(m.group(1)), 2 * int(m.group(2)), wb
        )
    m = re.search(r"sem_seg_head/l(\d+)_norm(\d+)$", p)
    if m:
        return "sem_seg_head.p{}.{}.norm.{}".format(
            2 + int(m.group(1)), 2 * int(m.group(2)),
            "weight" if leaf in ("scale", "weight") else _NORM_LEAVES.get(leaf, leaf),
        )
    m = re.search(r"sem_seg_head/predictor$", p)
    if m:
        return "sem_seg_head.predictor.{}".format(wb)
    return None


def _suffix_match(d2_name: str, state: Dict[str, np.ndarray]) -> Optional[str]:
    """Reference align_and_update_state_dicts matching: the ckpt key must equal
    the model name or be a complete '.'-separated suffix of it; longest wins."""
    if d2_name in state:
        return d2_name
    best = None
    for key in state:
        if d2_name.endswith("." + key) and (best is None or len(key) > len(best)):
            best = key
    return best


def _convert_tensor(src: np.ndarray, target_shape, torch_name: str) -> Optional[np.ndarray]:
    """Layout conversions torch -> flax; returns None on irreconcilable shape."""
    tgt = tuple(target_shape)
    if src.ndim == 4 and len(tgt) == 4:
        if "deconv" in torch_name or "lowres" in torch_name:
            # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out).
            # torch's op is the GRADIENT of conv (kernel applied rot-180), while
            # flax/lax conv_transpose is a fractionally-strided FORWARD conv, so
            # the spatial taps must be flipped (verified vs torch numerically;
            # see tests/test_goldens.py::test_mask_rcnn_model_e2e_golden).
            out = np.transpose(src[:, :, ::-1, ::-1], (2, 3, 0, 1))
        else:
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            out = np.transpose(src, (2, 3, 1, 0))
        return out if out.shape == tgt else None
    if src.ndim == 2 and len(tgt) == 2:
        out_dim, in_dim = src.shape
        if (in_dim, out_dim) != tgt:
            return None
        return src.T
    if src.ndim == 1 and len(tgt) == 1 and src.shape[0] == tgt[0]:
        return src
    return None


# fcs whose torch input dim flattens a pooled CHW map; flax flattens HWC.
# box_head.fc1 (and cascade stages box_head.<k>.fc1) consume the 7x7 pooled map.
_FLATTEN_FC_RE = re.compile(r"box_head\.(\d+\.)?fc1\.weight$")


def _fc_chw_to_hwc(weight_t: np.ndarray, pooled_hw: int) -> np.ndarray:
    """Permute the input dim of an (in, out) fc weight from CHW to HWC order."""
    in_dim, out_dim = weight_t.shape
    if in_dim % (pooled_hw * pooled_hw) != 0:
        return weight_t
    channels = in_dim // (pooled_hw * pooled_hw)
    w = weight_t.reshape(channels, pooled_hw, pooled_hw, out_dim)
    return np.transpose(w, (1, 2, 0, 3)).reshape(in_dim, out_dim)


_BN_EPS = 1e-5  # FrozenBatchNorm2d eps (reference batch_norm.py:35)


def load_torch_checkpoint(checkpointer, path: str, pooled_hw: int = 7) -> Dict:
    """Name-matched load into checkpointer.checkpointables['model']."""
    state, is_c2 = _load_state_dict(path)
    logger.info("Loaded %d tensors from %s (caffe2=%s)", len(state), path, is_c2)
    if is_c2:
        state = convert_c2_names(state)
    # Reference FrozenBatchNorm2d version<3 load semantics: metadata-less
    # state dicts (all .pkl zoo files + Caffe2 blobs) carry var-with-eps, and
    # the torch load hook subtracts eps before use (batch_norm.py:62-75).
    state = {
        k: (v - _BN_EPS if k.endswith("running_var") else v) for k, v in state.items()
    }
    target = checkpointer.checkpointables.get("model")
    if target is None:
        logger.warning("No 'model' checkpointable registered; skipping torch load")
        return {}

    import jax

    flat = jax.tree_util.tree_flatten_with_path(target)[0]
    matched, missed = 0, []
    used_keys = set()
    new_leaves = []
    for path_t, value in flat:
        parts = [str(getattr(pp, "key", pp)) for pp in path_t]
        d2_name = _flax_path_to_torch_name(parts)
        src_key = _suffix_match(d2_name, state) if d2_name else None
        if src_key is not None:
            conv = _convert_tensor(state[src_key], value.shape, d2_name)
            if conv is not None:
                if conv.ndim == 2 and _FLATTEN_FC_RE.search(d2_name):
                    conv = _fc_chw_to_hwc(conv, pooled_hw)
                new_leaves.append(np.asarray(conv, dtype=np.asarray(value).dtype))
                used_keys.add(src_key)
                matched += 1
                continue
            logger.warning(
                "Shape of %s %s does not fit %s %s; not loaded",
                src_key, state[src_key].shape, d2_name, tuple(value.shape),
            )
        missed.append(d2_name or "/".join(parts))
        new_leaves.append(value)
    logger.info("Matched %d/%d parameters from torch checkpoint", matched, len(flat))
    if missed:
        logger.warning("Unmatched model parameters (kept initialized): %s ...", missed[:20])
    unused = [k for k in state if k not in used_keys]
    if unused:
        logger.info("Checkpoint tensors not used by the model: %s ...", sorted(unused)[:20])

    treedef = jax.tree_util.tree_structure(target)
    checkpointer.checkpointables["model"] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return {"matched": matched, "total": len(flat)}
