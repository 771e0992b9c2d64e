"""PreciseBN: recomputed FrozenBN statistics match empirical activation moments
(reference detectron2/engine/hooks.py:397-470 + fvcore update_bn_stats)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fsgd_tpu.layers.norms import FrozenBatchNorm
from fsgd_tpu.layers.precise_bn import update_bn_stats


class _ConvBN(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), name="conv1")(x)
        x = FrozenBatchNorm(features=8, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(4, (3, 3), name="conv2")(x)
        x = FrozenBatchNorm(features=4, name="bn2")(x)
        return x


def test_update_bn_stats_recovers_input_moments():
    module = _ConvBN()
    rng = jax.random.PRNGKey(0)
    params = module.init(rng, jnp.zeros((2, 16, 16, 3)))["params"]
    # de-trivialize the frozen affines so the inversion is exercised
    params["bn1"]["weight"] = jnp.linspace(0.5, 2.0, 8)
    params["bn1"]["bias"] = jnp.linspace(-1.0, 1.0, 8)
    params["bn1"]["running_mean"] = jnp.linspace(-0.2, 0.3, 8)
    params["bn1"]["running_var"] = jnp.linspace(0.5, 1.5, 8)

    data = np.random.RandomState(1).randn(6, 4, 16, 16, 3).astype(np.float32) * 2.0 + 0.5
    new_params = update_bn_stats(module, params, iter(data), num_iters=6)

    # empirical moments of the conv1 output over the same data
    conv_out = np.concatenate(
        [
            np.asarray(
                nn.Conv(8, (3, 3)).apply({"params": params["conv1"]}, jnp.asarray(b))
            ).reshape(-1, 8)
            for b in data
        ]
    )
    np.testing.assert_allclose(
        np.asarray(new_params["bn1"]["running_mean"]), conv_out.mean(0), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(new_params["bn1"]["running_var"]), conv_out.var(0), rtol=1e-2, atol=1e-3
    )
    # untouched layers keep their params
    np.testing.assert_allclose(
        np.asarray(new_params["conv1"]["kernel"]), np.asarray(params["conv1"]["kernel"])
    )


def test_update_bn_stats_on_resnet_backbone():
    """The capture path works through the real backbone hierarchy."""
    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.models.backbone.resnet import build_resnet_backbone
    from fsgd_tpu.layers import ShapeSpec

    cfg = get_cfg()
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    backbone = build_resnet_backbone(cfg, ShapeSpec(channels=3))
    params = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    data = np.random.RandomState(0).randn(2, 1, 64, 64, 3).astype(np.float32)
    new_params = update_bn_stats(backbone, params, iter(data), num_iters=2)
    # the stem BN stats moved away from the (0, 1) init
    flat_new = jax.tree_util.tree_leaves_with_path(new_params)
    moved = 0
    for path, leaf in flat_new:
        keys = [getattr(p, "key", "") for p in path]
        if keys and keys[-1] == "running_mean" and np.abs(np.asarray(leaf)).max() > 1e-6:
            moved += 1
    assert moved > 0
