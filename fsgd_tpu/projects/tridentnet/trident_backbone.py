"""TridentNet backbone components.

Parity with projects/TridentNet/tridentnet/trident_conv.py:10-110 and
trident_backbone.py:15-180: ``TridentConv`` applies ONE shared weight with
per-branch dilations; ``TridentBottleneckBlock`` runs the bottleneck over all
branches; ``build_trident_resnet_backbone`` builds a C4 ResNet whose res4
stage is tridented.  Branch outputs are stacked into the batch dimension
(reference semantics), so the downstream RPN/ROI heads operate per-branch;
"TridentNet-Fast" inference keeps a single branch, which makes the tridented
backbone behave like a plain C4 backbone with the test branch's dilation.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fsgd_tpu.layers import ShapeSpec
from fsgd_tpu.layers.norms import get_norm
from fsgd_tpu.models.backbone.resnet import BottleneckBlock, ResNet, conv_init
from fsgd_tpu.models.build import BACKBONE_REGISTRY


class TridentConv(nn.Module):
    """One weight, N dilated applications (reference trident_conv.py:10-110)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilations: Sequence[int] = (1, 2, 3)
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        assert len(inputs) == len(self.dilations)
        k = self.kernel_size
        weight = self.param(
            "kernel", conv_init, (k, k, inputs[0].shape[-1], self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        import jax

        outs = []
        for x, dil in zip(inputs, self.dilations):
            pad = (k - 1) // 2 * dil
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                weight.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(y.dtype)
            outs.append(y)
        return outs


class TridentBottleneckBlock(nn.Module):
    """Bottleneck whose 3x3 conv is a TridentConv over branches
    (reference trident_backbone.py:15-118)."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilations: Sequence[int] = (1, 2, 3)
    concat_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_branch = len(self.dilations)
        if not isinstance(x, list):
            x = [x] * num_branch
        stride_1x1, stride_3x3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        conv1 = nn.Conv(self.bottleneck_channels, (1, 1), strides=(stride_1x1, stride_1x1),
                        use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv1")
        conv3 = nn.Conv(self.out_channels, (1, 1), use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, param_dtype=jnp.float32, name="conv3")
        shortcut_conv = None
        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut_conv = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                                    param_dtype=jnp.float32, name="shortcut")
        norms1 = get_norm(self.norm, self.bottleneck_channels)
        norms2 = get_norm(self.norm, self.bottleneck_channels)
        norms3 = get_norm(self.norm, self.out_channels)
        norms_s = get_norm(self.norm, self.out_channels)

        mids = [nn.relu(norms1(conv1(b))) if norms1 is not None else nn.relu(conv1(b)) for b in x]
        mids = TridentConv(
            self.bottleneck_channels, 3, stride=stride_3x3, dilations=self.dilations,
            dtype=self.dtype, name="conv2",
        )(mids)
        outs = []
        for b, mid in zip(x, mids):
            m = norms2(mid) if norms2 is not None else mid
            m = nn.relu(m)
            m = conv3(m)
            if norms3 is not None:
                m = norms3(m)
            if shortcut_conv is not None:
                s = shortcut_conv(b)
                if norms_s is not None:
                    s = norms_s(s)
            else:
                s = b
            outs.append(nn.relu(m + s))
        if self.concat_output:
            return jnp.concatenate(outs, axis=0)  # branches into the batch dim
        return outs


class TridentResNet(nn.Module):
    """C4 ResNet with a tridented res4 (returns branch-concatenated 'res4')."""

    stage_blocks: Sequence[int]
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    norm: str = "FrozenBN"
    freeze_at: int = 0
    branch_dilations: Sequence[int] = (1, 2, 3)
    test_branch_idx: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        import jax

        from fsgd_tpu.models.backbone.resnet import BasicStem

        x = BasicStem(64, self.norm, self.dtype, name="stem")(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        in_channels, out_channels = 64, 256
        bottleneck = self.num_groups * self.width_per_group
        for idx, num_blocks in enumerate(self.stage_blocks[:3]):  # res2..res4
            stage_idx = idx + 2
            name = "res{}".format(stage_idx)
            first_stride = 1 if idx == 0 else 2
            is_trident = stage_idx == 4
            for b in range(num_blocks):
                if is_trident:
                    x = TridentBottleneckBlock(
                        in_channels=in_channels,
                        out_channels=out_channels,
                        bottleneck_channels=bottleneck,
                        stride=first_stride if b == 0 else 1,
                        norm=self.norm,
                        stride_in_1x1=self.stride_in_1x1,
                        dilations=self.branch_dilations,
                        concat_output=(b == num_blocks - 1),
                        dtype=self.dtype,
                        name="{}_block{}".format(name, b),
                    )(x)
                else:
                    x = BottleneckBlock(
                        in_channels=in_channels,
                        out_channels=out_channels,
                        bottleneck_channels=bottleneck,
                        stride=first_stride if b == 0 else 1,
                        num_groups=self.num_groups,
                        norm=self.norm,
                        stride_in_1x1=self.stride_in_1x1,
                        dtype=self.dtype,
                        name="{}_block{}".format(name, b),
                    )(x)
                in_channels = out_channels
            if self.freeze_at >= stage_idx and not is_trident:
                x = jax.lax.stop_gradient(x)
            out_channels *= 2
            bottleneck *= 2
        return {"res4": x}

    def output_shape(self):
        return {"res4": ShapeSpec(channels=1024, stride=16)}

    @property
    def size_divisibility(self):
        return 32


@BACKBONE_REGISTRY.register()
def build_trident_resnet_backbone(cfg, input_shape=None) -> TridentResNet:
    depth = cfg.MODEL.RESNETS.DEPTH
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    trident = cfg.MODEL.get("TRIDENT", None)
    return TridentResNet(
        stage_blocks=blocks,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        norm=cfg.MODEL.RESNETS.NORM,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        branch_dilations=tuple(trident.BRANCH_DILATIONS) if trident else (1, 2, 3),
        test_branch_idx=trident.TEST_BRANCH_IDX if trident else 1,
        dtype=dtype,
    )
