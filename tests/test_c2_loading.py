"""Caffe2/Detectron1 zoo-weight ingestion tests.

A synthetic Caffe2-named blob dict (Detectron1 naming: conv1_w,
res2_0_branch2a_bn_s, fpn_inner_res2_0_sum_lateral_w, fc6_w, cls_score_w with
background-first classes, ...) built by inverse-transforming our params must
load back bit-exactly through convert_c2_names + suffix matching + layout
conversions (reference spec: detectron2/checkpoint/c2_model_loading.py:12-313).
"""

import pickle
import re

import numpy as np
import pytest

import jax

from fsgd_tpu.checkpoint import Checkpointer
from fsgd_tpu.checkpoint.catalog import ModelCatalog, resolve_checkpoint_path
from fsgd_tpu.checkpoint.torch_loader import (
    _flax_path_to_torch_name,
    convert_c2_names,
)
from fsgd_tpu.models import build_model


_BRANCH = {"conv1": "branch2a", "conv2": "branch2b", "conv3": "branch2c", "shortcut": "branch1"}


def _d2_to_c2_name(d2: str):
    """Inverse name map d2 -> Caffe2 blob, for the families we synthesize.

    Returns None for tensors absent from Caffe2 checkpoints (BN running
    stats: MSRA ImageNet pkls ship affine-fused BN only).
    """
    if d2.endswith(".norm.running_mean") or d2.endswith(".norm.running_var"):
        return None
    m = re.match(r"^backbone\.(?:bottom_up\.)?stem\.conv1\.(weight|norm\.weight|norm\.bias)$", d2)
    if m:
        return {"weight": "conv1_w", "norm.weight": "res_conv1_bn_s", "norm.bias": "res_conv1_bn_b"}[m.group(1)]
    m = re.match(r"^backbone\.(?:bottom_up\.)?res(\d)\.(\d+)\.(conv\d|shortcut)\.(weight|norm\.weight|norm\.bias)$", d2)
    if m:
        s, b, sub, leaf = m.groups()
        suffix = {"weight": "w", "norm.weight": "bn_s", "norm.bias": "bn_b"}[leaf]
        return "res{}_{}_{}_{}".format(s, b, _BRANCH[sub], suffix)
    m = re.match(r"^backbone\.fpn_lateral(\d)\.(weight|bias)$", d2)
    if m:
        return "fpn_inner_res{}_0_sum_lateral_{}".format(m.group(1), m.group(2)[0])
    m = re.match(r"^backbone\.fpn_output(\d)\.(weight|bias)$", d2)
    if m:
        return "fpn_res{}_0_sum_{}".format(m.group(1), m.group(2)[0])
    m = re.match(r"^proposal_generator\.rpn_head\.(conv|objectness_logits|anchor_deltas)\.(weight|bias)$", d2)
    if m:
        blob = {"conv": "conv_rpn_fpn2", "objectness_logits": "rpn_cls_logits_fpn2",
                "anchor_deltas": "rpn_bbox_pred_fpn2"}[m.group(1)]
        return "{}_{}".format(blob, m.group(2)[0])
    m = re.match(r"^roi_heads\.box_head\.fc(\d)\.(weight|bias)$", d2)
    if m:
        return "fc{}_{}".format(int(m.group(1)) + 5, m.group(2)[0])
    m = re.match(r"^roi_heads\.box_predictor\.(cls_score|bbox_pred)\.(weight|bias)$", d2)
    if m:
        return "{}_{}".format(m.group(1), m.group(2)[0])
    m = re.match(r"^roi_heads\.mask_head\.mask_fcn(\d+)\.(weight|bias)$", d2)
    if m:
        return "_[mask]_fcn{}_{}".format(m.group(1), m.group(2)[0])
    m = re.match(r"^roi_heads\.mask_head\.deconv\.(weight|bias)$", d2)
    if m:
        return "conv5_mask_{}".format(m.group(1)[0])
    m = re.match(r"^roi_heads\.mask_head\.predictor\.(weight|bias)$", d2)
    if m:
        return "mask_fcn_logits_{}".format(m.group(1)[0])
    m = re.match(r"^roi_heads\.keypoint_head\.conv_fcn(\d+)\.(weight|bias)$", d2)
    if m:
        return "conv_fcn{}_{}".format(m.group(1), m.group(2)[0])
    m = re.match(r"^roi_heads\.keypoint_head\.score_lowres\.(weight|bias)$", d2)
    if m:
        return "kps_score_lowres_{}".format(m.group(1)[0])
    raise AssertionError("no inverse C2 name for {}".format(d2))


def _make_c2_blobs(params, pooled_hw=7, seed=11):
    """Inverse-convert flax params into Caffe2-named torch-layout blobs."""
    rng = np.random.RandomState(seed)
    blobs = {}
    for path, value in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = [str(getattr(p, "key", p)) for p in path]
        d2 = _flax_path_to_torch_name(parts)
        assert d2 is not None, "/".join(parts)
        c2 = _d2_to_c2_name(d2)
        if c2 is None:
            continue  # fused BN: no running stats in the blob file
        v = np.asarray(value, np.float32)
        if v.ndim == 2:
            # flax (in, out); undo the HWC flatten for pooled-map fc1s
            if re.search(r"box_head\.fc1\.weight$", d2):
                c = v.shape[0] // (pooled_hw * pooled_hw)
                v = v.reshape(pooled_hw, pooled_hw, c, v.shape[1])
                v = np.transpose(v, (2, 0, 1, 3)).reshape(-1, v.shape[-1])
            v = v.T  # torch (out, in)
        elif v.ndim == 4:
            if "deconv" in d2 or "lowres" in d2:
                # (kh,kw,in,out)->(in,out,kh,kw) + rot-180 (torch ConvTranspose2d
                # kernels are gradient-of-conv taps; loader flips them back)
                v = np.transpose(v, (2, 3, 0, 1))[:, :, ::-1, ::-1]
            else:
                v = np.transpose(v, (3, 2, 0, 1))  # ->(out,in,kh,kw)
        # Caffe2 puts the background class first: prepend junk that the
        # converter must strip / rotate to the end.
        if c2.startswith("bbox_pred_"):
            v = np.concatenate([rng.rand(4, *v.shape[1:]).astype(np.float32), v], axis=0)
        elif c2.startswith("mask_fcn_logits_"):
            v = np.concatenate([rng.rand(1, *v.shape[1:]).astype(np.float32), v], axis=0)
        elif c2.startswith("cls_score_"):
            v = np.concatenate([v[-1:], v[:-1]], axis=0)  # bg (last in d2) -> first
        blobs[c2] = v
    # momentum blobs must be ignored by the loader
    blobs["res2_0_branch2a_w_momentum"] = np.zeros((1,), np.float32)
    return blobs


def _leaf_paths(params):
    return [
        ("/".join(str(getattr(p, "key", p)) for p in path), np.asarray(v))
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
    ]


@pytest.mark.slow
def test_caffe2_pkl_roundtrip(tmp_path):
    from test_rcnn import rcnn_cfg

    cfg = rcnn_cfg(mask_on=True, keypoint_on=True)
    model = build_model(cfg)
    params_src = model.init_params(jax.random.PRNGKey(3), image_size=(64, 64))
    blobs = _make_c2_blobs(params_src)

    pkl = tmp_path / "model_c2.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"blobs": blobs}, f)  # Detectron1 format: blobs + no __author__

    params_dst = model.init_params(jax.random.PRNGKey(9), image_size=(64, 64))
    ckpt = Checkpointer(model=params_dst)
    stats = ckpt.load(str(pkl))
    loaded = ckpt.checkpointables["model"]

    n_stats = 0
    for (name, src), (name2, got) in zip(_leaf_paths(params_src), _leaf_paths(loaded)):
        assert name == name2
        if "running_mean" in name or "running_var" in name:
            n_stats += 1  # not in the blob file; stays at init
            continue
        np.testing.assert_array_equal(src, got, err_msg=name)
    total = len(_leaf_paths(params_src))
    assert stats["matched"] == total - n_stats
    assert n_stats > 0


def test_convert_c2_names_families():
    names = [
        "conv1_w", "res_conv1_bn_s", "res_conv1_bn_b",
        "res2_0_branch2a_w", "res2_0_branch2a_bn_s", "res3_1_branch1_bn_b",
        "fpn_inner_res4_5_sum_lateral_w", "fpn_res2_2_sum_b",
        "conv_rpn_fpn2_w", "rpn_cls_logits_fpn2_b", "rpn_bbox_pred_fpn2_w",
        "fc6_w", "fc7_b", "cls_score_w", "bbox_pred_b",
        "_[mask]_fcn2_w", "conv5_mask_b", "mask_fcn_logits_w",
        "conv_fcn3_w", "kps_score_lowres_w",
    ]
    ncls = 5
    blobs = {}
    for n in names:
        if n.startswith("cls_score"):
            blobs[n] = np.zeros((ncls + 1,) if n.endswith("_b") else (ncls + 1, 8), np.float32)
            blobs[n][0] = 1.0  # background row
        elif n.startswith("bbox_pred"):
            blobs[n] = np.zeros((4 * (ncls + 1),) if n.endswith("_b") else (4 * (ncls + 1), 8), np.float32)
        elif n.startswith("mask_fcn_logits"):
            blobs[n] = np.zeros((ncls + 1, 8, 1, 1), np.float32)
        else:
            blobs[n] = np.zeros((2, 2), np.float32)
    out = convert_c2_names(blobs)
    expected = {
        "stem.conv1.weight", "stem.conv1.norm.weight", "stem.conv1.norm.bias",
        "res2.0.conv1.weight", "res2.0.conv1.norm.weight", "res3.1.shortcut.norm.bias",
        "fpn_lateral4.weight", "fpn_output2.bias",
        "proposal_generator.rpn_head.conv.weight",
        "proposal_generator.rpn_head.objectness_logits.bias",
        "proposal_generator.rpn_head.anchor_deltas.weight",
        "box_head.fc1.weight", "box_head.fc2.bias", "cls_score.weight", "bbox_pred.bias",
        "mask_head.mask_fcn2.weight", "mask_head.deconv.bias", "mask_head.predictor.weight",
        "roi_heads.keypoint_head.conv_fcn3.weight",
        "roi_heads.keypoint_head.score_lowres.weight",
    }
    assert set(out.keys()) == expected
    # background surgery
    assert out["cls_score.weight"].shape == (ncls + 1, 8)
    assert out["cls_score.weight"][-1, 0] == 1.0  # bg moved to the end
    assert out["bbox_pred.bias"].shape == (4 * ncls,)
    assert out["mask_head.predictor.weight"].shape == (ncls, 8, 1, 1)


def test_catalog_resolution(monkeypatch):
    monkeypatch.setenv("FSGD_MODEL_ZOO", "/zoo")
    p = resolve_checkpoint_path("catalog://ImageNetPretrained/MSRA/R-50")
    assert p == "/zoo/ImageNetPretrained/MSRA/R-50.pkl"
    p = resolve_checkpoint_path("detectron2://COCO-Detection/faster_rcnn_R_50_FPN_1x/137257794/model_final_b275ba.pkl")
    assert p == "/zoo/COCO-Detection/faster_rcnn_R_50_FPN_1x/137257794/model_final_b275ba.pkl"
    p = resolve_checkpoint_path("catalog://Caffe2Detectron/COCO/35857345/e2e_faster_rcnn_R-50-FPN_1x")
    assert p.startswith("/zoo/35857345/12_2017_baselines/") and p.endswith("generalized_rcnn/model_final.pkl")
    monkeypatch.delenv("FSGD_MODEL_ZOO")
    p = resolve_checkpoint_path("catalog://ImageNetPretrained/MSRA/R-50")
    assert p == "https://dl.fbaipublicfiles.com/detectron/ImageNetPretrained/MSRA/R-50.pkl"
    # unknown scheme passthrough
    assert resolve_checkpoint_path("/tmp/x.ckpt") == "/tmp/x.ckpt"


def test_model_zoo_trained_raises_without_mirror(monkeypatch):
    monkeypatch.delenv("FSGD_MODEL_ZOO", raising=False)
    from fsgd_tpu import model_zoo

    with pytest.raises(FileNotFoundError):
        model_zoo.get("COCO-Detection/retinanet_R_50_FPN_1x.yaml", trained=True)
