"""Feature Pyramid Network in flax.linen (NHWC).

Parity with detectron2/modeling/backbone/fpn.py:16-244 (``FPN`` with
``LastLevelMaxPool`` p6 / ``LastLevelP6P7`` p6-p7 for RetinaNet, FUSE_TYPE
sum/avg, builders ``build_resnet_fpn_backbone`` and
``build_retinanet_resnet_fpn_backbone``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...layers import ShapeSpec
from ...layers.norms import get_norm
from ...layers.wrappers import interpolate_nearest_2x
from ..build import BACKBONE_REGISTRY
from .resnet import ResNet, build_resnet_backbone

# caffe2 XavierFill on fan_in == uniform(-sqrt(3/fan_in), +sqrt(3/fan_in))
xavier_init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class FPN(nn.Module):
    bottom_up: ResNet
    in_features: Sequence[str]  # e.g. ("res2", "res3", "res4", "res5")
    out_channels: int = 256
    norm: str = ""
    top_block: str = ""  # "", "maxpool" (p6) or "p6p7"
    top_block_in_feature: str = "p5"  # or "res5" for RetinaNet-style P6P7
    fuse_type: str = "sum"
    dtype: Any = jnp.bfloat16

    def _conv(self, features, kernel, stride=1, name=""):
        return nn.Conv(
            features=features,
            kernel_size=(kernel, kernel),
            strides=(stride, stride),
            padding=(((kernel - 1) // 2,) * 2, ((kernel - 1) // 2,) * 2),
            use_bias=(self.norm == ""),
            kernel_init=xavier_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        bottom_up_features = self.bottom_up(x)
        in_feats = list(self.in_features)
        strides = {f: s.stride for f, s in self.bottom_up.output_shape().items()}

        # lateral 1x1 + output 3x3, top-down accumulation from the coarsest level
        results = {}
        prev = None
        for f in in_feats[::-1]:
            lateral = self._conv(self.out_channels, 1, name="fpn_lateral_{}".format(f))(bottom_up_features[f])
            norm = get_norm(self.norm, self.out_channels)
            if norm is not None:
                lateral = norm(lateral)
            if prev is not None:
                lateral = lateral + interpolate_nearest_2x(prev)
                if self.fuse_type == "avg":
                    lateral = lateral / 2.0
            prev = lateral
            out = self._conv(self.out_channels, 3, name="fpn_output_{}".format(f))(lateral)
            norm_o = get_norm(self.norm, self.out_channels)
            if norm_o is not None:
                out = norm_o(out)
            stage = {"res2": "p2", "res3": "p3", "res4": "p4", "res5": "p5"}[f]
            results[stage] = out

        if self.top_block == "maxpool":
            # LastLevelMaxPool: p6 = maxpool(p5, 1x1 kernel stride 2)
            results["p6"] = nn.max_pool(results["p5"], (1, 1), strides=(2, 2))
        elif self.top_block == "p6p7":
            # LastLevelP6P7 (RetinaNet): 3x3 s2 convs from the chosen input
            top_in = (
                bottom_up_features[self.top_block_in_feature]
                if self.top_block_in_feature in bottom_up_features
                else results[self.top_block_in_feature]
            )
            p6 = self._conv(self.out_channels, 3, stride=2, name="fpn_p6")(top_in)
            p7 = self._conv(self.out_channels, 3, stride=2, name="fpn_p7")(nn.relu(p6))
            results["p6"] = p6
            results["p7"] = p7
        return results

    def output_shape(self) -> Dict[str, ShapeSpec]:
        bu = self.bottom_up.output_shape()
        stage_of = {"res2": "p2", "res3": "p3", "res4": "p4", "res5": "p5"}
        shapes = {
            stage_of[f]: ShapeSpec(channels=self.out_channels, stride=bu[f].stride)
            for f in self.in_features
        }
        max_stride = max(s.stride for s in shapes.values())
        if self.top_block == "maxpool":
            shapes["p6"] = ShapeSpec(channels=self.out_channels, stride=max_stride * 2)
        elif self.top_block == "p6p7":
            shapes["p6"] = ShapeSpec(channels=self.out_channels, stride=max_stride * 2)
            shapes["p7"] = ShapeSpec(channels=self.out_channels, stride=max_stride * 4)
        return shapes

    @property
    def size_divisibility(self) -> int:
        strides = [s.stride for s in self.output_shape().values()]
        return max(strides)


@BACKBONE_REGISTRY.register()
def build_resnet_fpn_backbone(cfg, input_shape: ShapeSpec = None) -> FPN:
    bottom_up = build_resnet_backbone(cfg, input_shape)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        top_block="maxpool",
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_retinanet_resnet_fpn_backbone(cfg, input_shape: ShapeSpec = None) -> FPN:
    """RetinaNet FPN: P3-P7 with P6/P7 from res5 (reference fpn.py:223-244)."""
    bottom_up = build_resnet_backbone(cfg, input_shape)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        top_block="p6p7",
        top_block_in_feature="res5",
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        dtype=dtype,
    )
