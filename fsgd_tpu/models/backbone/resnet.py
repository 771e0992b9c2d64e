"""ResNet / ResNeXt backbone in flax.linen (NHWC, bf16-friendly).

Parity with detectron2/modeling/backbone/resnet.py:31-479 (``BasicStem``,
``BottleneckBlock``, stage construction, ``build_resnet_backbone``): depths
18/34 are unsupported exactly as in the reference; R-50/101/152 with ResNeXt
groups, DC5 dilation, STRIDE_IN_1X1 and FREEZE_AT are all honored.

TPU design notes: convolutions run in ``dtype`` (bfloat16 by default) with
float32 parameters; stage freezing is functional — frozen stages run under
``jax.lax.stop_gradient`` so their parameters receive zero gradient (the
solver additionally masks them out of weight decay).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...layers import ShapeSpec
from ...layers.norms import FrozenBatchNorm, get_norm
from ..build import BACKBONE_REGISTRY

# MSRAFill / caffe2 conv init: kaiming-normal with fan_out
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class S2DConv7x7(nn.Module):
    """7x7 stride-2 conv computed as a 4x4 stride-1 conv over the 2x2
    space-to-depth rearrangement of the input.

    Numerically identical (the same 147 products per output element,
    reassociated), but the MXU contraction sees 4*C_in input channels
    instead of C_in — for the RGB stem that is 12 vs 3, and the measured
    fwd+bwd cost drops 11.0 -> 6.9 ms at 800x1344x8 bf16
    (dev/conv_experiments.py ``stem_pad`` row; the MLPerf ResNet trick).

    The parameter keeps the canonical (7, 7, C, F) layout — checkpoint /
    model-zoo parity is untouched — and is rearranged at apply time: pad
    the taps to (8, 8) at the top-left, split each spatial axis into
    (outer 4, parity 2), and fold the parity pair into the input channels.
    Odd spatial extents fall back to the direct convolution.
    """

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", conv_init, (7, 7, c, self.features), jnp.float32)
        n, h, w, _ = x.shape
        if h % 2 or w % 2:
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x2 = (
                x.reshape(n, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, h // 2, w // 2, 4 * c)
            )
            # w2[ay, ax, (dy, dx, c), f] = kernel[2*ay+dy-1, 2*ax+dx-1, c, f]
            # so that out[y, x] = sum kernel[ky, kx] * in[2y+ky-3, 2x+kx-3]
            # with ky = 2*ay+dy-1 and the (2,1) asymmetric padding below.
            wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            w2 = (
                wp.reshape(4, 2, 4, 2, c, self.features)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 4 * c, self.features)
            )
            out = jax.lax.conv_general_dilated(
                x2.astype(self.dtype), w2.astype(self.dtype),
                (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class ConvNorm(nn.Module):
    """Conv2D + optional norm (no activation)."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = "FrozenBN"
    use_bias: Optional[bool] = None
    dtype: Any = jnp.bfloat16
    s2d: bool = False  # 7x7/2 space-to-depth rewrite (stem only)

    @nn.compact
    def __call__(self, x):
        use_bias = self.use_bias if self.use_bias is not None else (self.norm == "")
        if self.s2d and self.kernel == (7, 7) and self.stride == 2 and self.dilation == 1 and self.groups == 1:
            x = S2DConv7x7(self.features, use_bias=use_bias, dtype=self.dtype, name="conv")(x)
            norm = get_norm(self.norm, self.features)
            if norm is not None:
                x = norm(x)
            return x
        pad = ((self.kernel[0] - 1) // 2 * self.dilation, (self.kernel[1] - 1) // 2 * self.dilation)
        x = nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=(self.stride, self.stride),
            padding=(pad, pad),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=use_bias,
            kernel_init=conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        norm = get_norm(self.norm, self.features)
        if norm is not None:
            x = norm(x)
        return x


class BasicStem(nn.Module):
    """7x7 stride-2 conv + 3x3 stride-2 maxpool (stride 4 total)."""

    out_channels: int = 64
    norm: str = "FrozenBN"
    dtype: Any = jnp.bfloat16
    s2d: bool = True  # exact rewrite; TPU.STEM_S2D=False restores direct conv

    @nn.compact
    def __call__(self, x):
        x = ConvNorm(
            self.out_channels, (7, 7), stride=2, norm=self.norm,
            dtype=self.dtype, s2d=self.s2d, name="stem_conv1",
        )(x)
        x = nn.relu(x)
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class BottleneckBlock(nn.Module):
    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        stride_1x1, stride_3x3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        out = ConvNorm(self.bottleneck_channels, (1, 1), stride=stride_1x1, norm=self.norm, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(out)
        out = ConvNorm(
            self.bottleneck_channels,
            (3, 3),
            stride=stride_3x3,
            dilation=self.dilation,
            groups=self.num_groups,
            norm=self.norm,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = nn.relu(out)
        out = ConvNorm(self.out_channels, (1, 1), norm=self.norm, dtype=self.dtype, name="conv3")(out)

        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = ConvNorm(self.out_channels, (1, 1), stride=self.stride, norm=self.norm, dtype=self.dtype, name="shortcut")(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)



class DeformBottleneckBlock(nn.Module):
    """Bottleneck with (modulated) deformable conv2
    (reference resnet.py DeformBottleneckBlock; op in fsgd_tpu/ops/deform_conv.py)."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilation: int = 1
    deform_modulated: bool = False
    deform_num_groups: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from ...layers.norms import get_norm
        from ...ops.deform_conv import deform_conv2d

        stride_1x1, stride_3x3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = ConvNorm(self.bottleneck_channels, (1, 1), stride=stride_1x1, norm=self.norm, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(out)

        # offset (+ modulation mask) predictor: zero-init so the block starts
        # as a plain conv (reference behavior)
        g = self.deform_num_groups
        offset_channels = g * 9 * (3 if self.deform_modulated else 2)
        offsets_raw = nn.Conv(
            offset_channels, (3, 3), strides=(stride_3x3, stride_3x3),
            padding=((self.dilation,) * 2, (self.dilation,) * 2),
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            param_dtype=jnp.float32, name="conv2_offset",
        )(out.astype(jnp.float32))
        if self.deform_modulated:
            o = offsets_raw.reshape(*offsets_raw.shape[:3], g, 9, 3)
            offset = o[..., :2].reshape(*offsets_raw.shape[:3], g * 9 * 2)
            mask = jax.nn.sigmoid(o[..., 2]).reshape(*offsets_raw.shape[:3], g * 9)
        else:
            offset, mask = offsets_raw, None

        weight = self.param(
            "conv2_kernel", conv_init, (3, 3, self.bottleneck_channels, self.bottleneck_channels), jnp.float32
        )
        out = deform_conv2d(
            out.astype(jnp.float32), offset, weight, stride=stride_3x3,
            padding=self.dilation, dilation=self.dilation,
            deform_groups=g, mask=mask,
        ).astype(self.dtype)
        norm2 = get_norm(self.norm, self.bottleneck_channels)
        if norm2 is not None:
            out = norm2(out)
        out = nn.relu(out)
        out = ConvNorm(self.out_channels, (1, 1), norm=self.norm, dtype=self.dtype, name="conv3")(out)

        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = ConvNorm(self.out_channels, (1, 1), stride=self.stride, norm=self.norm, dtype=self.dtype, name="shortcut")(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class ResNet(nn.Module):
    """Configurable ResNet trunk returning a dict of stage features."""

    stage_blocks: Sequence[int]  # blocks per stage, e.g. (3, 4, 6, 3)
    out_features: Sequence[str]  # subset of {"stem", "res2".."res5"}
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    deform_num_groups: int = 1
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    norm: str = "FrozenBN"
    freeze_at: int = 0
    dtype: Any = jnp.bfloat16
    stem_s2d: bool = True

    @nn.compact
    def __call__(self, x):
        outputs: Dict[str, jnp.ndarray] = {}
        x = BasicStem(
            self.stem_out_channels, self.norm, self.dtype, s2d=self.stem_s2d, name="stem"
        )(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        if "stem" in self.out_features:
            outputs["stem"] = x

        in_channels = self.stem_out_channels
        out_channels = self.res2_out_channels
        bottleneck_channels = self.num_groups * self.width_per_group

        for idx, num_blocks in enumerate(self.stage_blocks):
            stage_idx = idx + 2  # res2..res5
            name = "res{}".format(stage_idx)
            dilation = self.res5_dilation if stage_idx == 5 else 1
            first_stride = 1 if idx == 0 or (stage_idx == 5 and dilation == 2) else 2
            use_deform = self.deform_on_per_stage[idx]
            block_cls = DeformBottleneckBlock if use_deform else BottleneckBlock
            extra = (
                dict(deform_modulated=self.deform_modulated, deform_num_groups=self.deform_num_groups)
                if use_deform
                else {}
            )
            for b in range(num_blocks):
                x = block_cls(
                    in_channels=in_channels,
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck_channels,
                    stride=first_stride if b == 0 else 1,
                    num_groups=self.num_groups,
                    norm=self.norm,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=dilation,
                    dtype=self.dtype,
                    name="{}_block{}".format(name, b),
                    **extra,
                )(x)
                in_channels = out_channels
            if self.freeze_at >= stage_idx:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
            in_channels = out_channels
            out_channels *= 2
            bottleneck_channels *= 2
        return outputs

    # -- static metadata ----------------------------------------------------
    def output_shape(self) -> Dict[str, ShapeSpec]:
        strides = {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}
        if self.res5_dilation == 2:
            strides["res5"] = 16
        channels = {"stem": self.stem_out_channels}
        c = self.res2_out_channels
        for i in range(4):
            channels["res{}".format(i + 2)] = c
            c *= 2
        return {
            f: ShapeSpec(channels=channels[f], stride=strides[f]) for f in self.out_features
        }

    @property
    def size_divisibility(self) -> int:
        return 32


_DEPTH_TO_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


@BACKBONE_REGISTRY.register()
def build_resnet_backbone(cfg, input_shape: ShapeSpec = None) -> ResNet:
    """Create a ResNet from config (reference resnet.py:405-479)."""
    depth = cfg.MODEL.RESNETS.DEPTH
    if depth not in _DEPTH_TO_BLOCKS:
        raise ValueError("Unsupported RESNETS.DEPTH: {} (50/101/152)".format(depth))
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return ResNet(
        stage_blocks=_DEPTH_TO_BLOCKS[depth],
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        norm=cfg.MODEL.RESNETS.NORM,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        deform_on_per_stage=tuple(cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE),
        deform_modulated=cfg.MODEL.RESNETS.DEFORM_MODULATED,
        deform_num_groups=cfg.MODEL.RESNETS.DEFORM_NUM_GROUPS,
        dtype=dtype,
        stem_s2d=cfg.TPU.get("STEM_S2D", True),
    )
