"""Zoo-weight loader test: a synthetic detectron2-style state dict (built by
inverse-transforming our params) must load back bit-exactly."""

import pickle

import numpy as np
import pytest

import jax

from common import retinanet_cfg

from fsgd_tpu.checkpoint import Checkpointer
from fsgd_tpu.checkpoint.torch_loader import _flax_path_to_torch_name
from fsgd_tpu.models import build_model


def _make_d2_state_dict(params):
    """Inverse-convert our flax params into detectron2-named torch layouts."""
    state = {}
    unmapped = []
    for path, value in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = [str(getattr(p, "key", p)) for p in path]
        name = _flax_path_to_torch_name(parts)
        v = np.asarray(value, np.float32)
        if name is None:
            unmapped.append("/".join(parts))
            continue
        if v.ndim == 4:
            if "deconv" in name or "score_lowres" in name:
                # inverse of the loader's flip+transpose (rot-180 taps)
                v = np.transpose(v, (2, 3, 0, 1))[:, :, ::-1, ::-1]
            else:
                v = np.transpose(v, (3, 2, 0, 1))
        elif v.ndim == 2:
            v = v.T
        if name.endswith("running_var"):
            # zoo .pkl convention: var stored WITH eps; loaders subtract it
            # (reference batch_norm.py:62-75, torch_loader._BN_EPS)
            v = v + 1e-5
        state[name] = v
    return state, unmapped


@pytest.mark.slow
def test_retinanet_zoo_roundtrip(tmp_path):
    cfg = retinanet_cfg()
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(3), image_size=(64, 64))

    state, unmapped = _make_d2_state_dict(params)
    # every RetinaNet parameter must have a detectron2 name
    assert unmapped == [], unmapped
    # expected d2 names exist
    assert "backbone.bottom_up.stem.conv1.weight" in state
    assert "backbone.bottom_up.res2.0.conv1.norm.running_mean" in state
    assert "backbone.fpn_lateral3.weight" in state
    assert "backbone.top_block.p6.weight" in state
    assert "head.cls_subnet.0.weight" in state
    assert "head.cls_score.bias" in state

    pkl = tmp_path / "zoo.pkl"
    with open(pkl, "wb") as f:
        # real d2 zoo files carry __author__; without it the loader must (and
        # does) assume Caffe2 naming — see test_c2_loading.py
        pickle.dump({"model": state, "__author__": "Detectron2 Model Zoo"}, f)

    # fresh init, then load: must reproduce the original params exactly
    params2 = model.init_params(jax.random.PRNGKey(9), image_size=(64, 64))
    ckpt = Checkpointer(model=params2)
    ckpt.load(str(pkl))
    loaded = ckpt.checkpointables["model"]
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        # running_var round-trips through the +eps (save) / -eps (load) zoo
        # convention: bit-exactness modulo one fp32 ulp of the eps add
        atol = 1e-6 if "running_var" in str(pa) else 0
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=atol, err_msg=str(pa))


@pytest.mark.slow
def test_faster_rcnn_zoo_mapping_coverage():
    from test_rcnn import rcnn_cfg

    cfg = rcnn_cfg(mask_on=True, keypoint_on=True)
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(64, 64))
    state, unmapped = _make_d2_state_dict(params)
    assert "proposal_generator.rpn_head.conv.weight" in state
    assert "roi_heads.box_head.fc1.weight" in state
    assert "roi_heads.box_predictor.cls_score.weight" in state
    assert "roi_heads.mask_head.deconv.weight" in state
    assert "roi_heads.keypoint_head.score_lowres.weight" in state
    assert unmapped == [], unmapped
