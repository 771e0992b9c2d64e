"""Load torch/detectron2 zoo checkpoints into fsgd_tpu param pytrees.

Role of the reference's detectron2/checkpoint/c2_model_loading.py +
detection_checkpoint.py:26-59: map detectron2 state-dict names onto our flax
parameter tree with the layout conversions (NCHW->NHWC conv kernels,
(out,in)->(in,out) linear weights, channel-major->HWC-major flatten for the
first fc after pooling) so MODEL_ZOO weights can seed inference-parity tests.

Covers ResNet(+FPN) backbones, RetinaNet heads, RPN heads and Standard ROI
box/mask/keypoint heads.  Unmatched parameters keep their initialization and
are reported, matching the reference's logging behavior.
"""

from __future__ import annotations

import logging
import pickle
import re
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        if "model" in data:
            data = data["model"]
        return {k: np.asarray(v) for k, v in data.items() if isinstance(v, np.ndarray)}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        data = data["model"]
    return {k: np.asarray(v.numpy()) for k, v in data.items() if hasattr(v, "numpy")}


_NORM_LEAVES = {"weight": "weight", "bias": "bias", "running_mean": "running_mean", "running_var": "running_var"}


def _flax_path_to_torch_name(parts) -> Optional[str]:
    """Translate a flax param path (list of scope names + leaf) into the
    detectron2 state-dict name.  Returns None when no mapping exists."""
    leaf = parts[-1]
    scopes = parts[:-1]
    p = "/".join(scopes)

    def norm_leaf():
        return _NORM_LEAVES.get(leaf)

    # ---- ResNet bottom-up -------------------------------------------------
    m = re.search(r"(?:backbone/)?(?:bottom_up/)?stem/stem_conv1/(conv|FrozenBatchNorm_0)$", p)
    if m:
        base = "backbone.bottom_up.stem.conv1"
        return base + (".weight" if m.group(1) == "conv" else ".norm." + norm_leaf())
    m = re.search(r"(?:backbone/)?(?:bottom_up/)?res(\d)_block(\d+)/(conv\d|shortcut)/(conv|FrozenBatchNorm_0)$", p)
    if m:
        stage, block, sub, kind = m.groups()
        base = "backbone.bottom_up.res{}.{}.{}".format(stage, block, sub)
        return base + (".weight" if kind == "conv" else ".norm." + norm_leaf())

    # ---- FPN ----------------------------------------------------------------
    m = re.search(r"backbone/fpn_lateral_res(\d)$", p)
    if m:
        return "backbone.fpn_lateral{}.{}".format(m.group(1), "weight" if leaf == "kernel" else "bias")
    m = re.search(r"backbone/fpn_output_res(\d)$", p)
    if m:
        return "backbone.fpn_output{}.{}".format(m.group(1), "weight" if leaf == "kernel" else "bias")
    m = re.search(r"backbone/fpn_p(\d)$", p)
    if m:
        return "backbone.top_block.p{}.{}".format(m.group(1), "weight" if leaf == "kernel" else "bias")

    # ---- RetinaNet head -----------------------------------------------------
    m = re.search(r"head/cls_tower(\d+)$", p)
    if m:
        return "head.cls_subnet.{}.{}".format(2 * int(m.group(1)), "weight" if leaf == "kernel" else "bias")
    m = re.search(r"head/box_tower(\d+)$", p)
    if m:
        return "head.bbox_subnet.{}.{}".format(2 * int(m.group(1)), "weight" if leaf == "kernel" else "bias")
    m = re.search(r"head/(cls_score|bbox_pred)$", p)
    if m:
        return "head.{}.{}".format(m.group(1), "weight" if leaf == "kernel" else "bias")

    # ---- RPN head -----------------------------------------------------------
    m = re.search(r"(?:proposal_generator/)?(conv|objectness_logits|anchor_deltas)$", p)
    if m and ("proposal_generator" in p or p in ("conv", "objectness_logits", "anchor_deltas")):
        return "proposal_generator.rpn_head.{}.{}".format(m.group(1), "weight" if leaf == "kernel" else "bias")

    # ---- ROI heads ----------------------------------------------------------
    m = re.search(r"roi_heads/box_head/fc(\d+)$", p)
    if m:
        return "roi_heads.box_head.fc{}.{}".format(int(m.group(1)) + 1, "weight" if leaf == "kernel" else "bias")
    m = re.search(r"roi_heads/box_head/conv(\d+)$", p)
    if m:
        return "roi_heads.box_head.conv{}.{}".format(int(m.group(1)) + 1, "weight" if leaf == "kernel" else "bias")
    m = re.search(r"roi_heads/box_predictor/(cls_score|bbox_pred)$", p)
    if m:
        return "roi_heads.box_predictor.{}.{}".format(m.group(1), "weight" if leaf == "kernel" else "bias")
    m = re.search(r"roi_heads/mask_head/(mask_fcn\d+|deconv|predictor)$", p)
    if m:
        return "roi_heads.mask_head.{}.{}".format(m.group(1), "weight" if leaf == "kernel" else "bias")
    m = re.search(r"roi_heads/keypoint_head/(conv_fcn\d+|score_lowres)$", p)
    if m:
        return "roi_heads.keypoint_head.{}.{}".format(m.group(1), "weight" if leaf == "kernel" else "bias")
    return None


def _convert_tensor(src: np.ndarray, target_shape, torch_name: str) -> Optional[np.ndarray]:
    """Layout conversions torch -> flax; returns None on irreconcilable shape."""
    tgt = tuple(target_shape)
    if src.ndim == 4 and len(tgt) == 4:
        if "deconv" in torch_name or "score_lowres" in torch_name:
            # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out)
            out = np.transpose(src, (2, 3, 0, 1))
        else:
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            out = np.transpose(src, (2, 3, 1, 0))
        return out if out.shape == tgt else None
    if src.ndim == 2 and len(tgt) == 2:
        out_dim, in_dim = src.shape
        if (in_dim, out_dim) != tgt:
            return None
        if tgt[0] != in_dim:
            return None
        # first fc after pooled features: torch flattens CHW, flax flattens HWC
        if in_dim != src.shape[1]:
            return None
        return src.T
    if src.ndim == 1 and len(tgt) == 1 and src.shape[0] == tgt[0]:
        return src
    return None


def _fc_chw_to_hwc(weight_t: np.ndarray, pooled_hw: int, channels: int) -> np.ndarray:
    """Permute the input dim of an (in, out) fc weight from CHW to HWC order."""
    in_dim, out_dim = weight_t.shape
    if in_dim != pooled_hw * pooled_hw * channels:
        return weight_t
    w = weight_t.reshape(channels, pooled_hw, pooled_hw, out_dim)
    return np.transpose(w, (1, 2, 0, 3)).reshape(in_dim, out_dim)


def load_torch_checkpoint(checkpointer, path: str, pooled_hw: int = 7, pooled_channels: int = 256) -> Dict:
    """Name-matched load into checkpointer.checkpointables['model']."""
    state = _load_state_dict(path)
    logger.info("Loaded %d tensors from %s", len(state), path)
    target = checkpointer.checkpointables.get("model")
    if target is None:
        logger.warning("No 'model' checkpointable registered; skipping torch load")
        return {}

    import jax

    flat = jax.tree_util.tree_flatten_with_path(target)[0]
    matched, missed = 0, []
    new_leaves = []
    for path_t, value in flat:
        parts = [str(getattr(pp, "key", pp)) for pp in path_t]
        torch_name = _flax_path_to_torch_name(parts)
        src = state.get(torch_name) if torch_name else None
        if src is not None:
            conv = _convert_tensor(src, value.shape, torch_name)
            if conv is not None:
                if torch_name == "roi_heads.box_head.fc1.weight":
                    conv = _fc_chw_to_hwc(conv, pooled_hw, pooled_channels)
                new_leaves.append(np.asarray(conv, dtype=np.asarray(value).dtype))
                matched += 1
                continue
        missed.append(torch_name or "/".join(parts))
        new_leaves.append(value)
    logger.info("Matched %d/%d parameters from torch checkpoint", matched, len(flat))
    if missed:
        logger.warning("Unmatched parameters (kept initialized): %s ...", missed[:20])

    treedef = jax.tree_util.tree_structure(target)
    checkpointer.checkpointables["model"] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return {}
