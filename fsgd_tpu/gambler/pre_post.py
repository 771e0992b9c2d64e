"""Pre/post adapters around the layered gambler U-Net.

Parity with ImbalanceDetection/imbalancedetection/modelling/pre_post_models.py:
``PreGamblerPredictions`` (one shared 1x1 conv applied to every FPN level),
``PostGamblerPredictions`` (per-level 1x1 convs p3..p7 + sigmoid),
``PreGamblerImage`` (stride-8 bilinear downsample or a small conv tower).
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet import DoubleConv, Down, torch_bilinear_downsample


class PreGamblerPredictions(nn.Module):
    out_channels: int
    num_conv: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layered_input: List[jnp.ndarray]) -> List[jnp.ndarray]:
        if self.num_conv == 1:
            convs = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv")]
        else:
            convs = [
                nn.Conv(256, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv0"),
                nn.Conv(128, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv1"),
                nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv2"),
            ]
        out = []
        for pred in layered_input:
            t = pred
            for conv in convs:  # shared across levels
                t = conv(t)
            out.append(t)
        return out


class PostGamblerPredictions(nn.Module):
    """Per-level 1x1 convs from decoder channels [64,128,256,512,1024] -> A."""

    out_channels: int
    prior_bias: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layered_output: List[jnp.ndarray]) -> List[jnp.ndarray]:
        # layered_output is deepest-first, e.g. [p7(1024ch), p6(512), p5(256),
        # p4(128), p3(64)] for the 5-scale pyramid; names stay p3.. for any N
        # so 5-scale checkpoints are unchanged.
        n = len(layered_output)
        names = ["p{}".format(3 + i) for i in range(n)][::-1]
        outs = {}
        for name, feat in zip(names, layered_output):
            outs[name] = nn.Conv(
                self.out_channels,
                (1, 1),
                bias_init=nn.initializers.constant(self.prior_bias),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )(feat)
        return [jax.nn.sigmoid(outs[nm]) for nm in sorted(outs)]


class PreGamblerImage(nn.Module):
    image_mode: str = "downsample"  # or "conv"
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        if self.image_mode == "downsample":
            # reference F.interpolate(scale_factor=1/8): plain bilinear
            # sampling, NOT the antialiased jax.image.resize
            return torch_bilinear_downsample(images, 8)
        if self.image_mode == "conv":
            x = DoubleConv(8, self.dtype, name="dc")(images)
            x = Down(16, self.dtype, name="d1")(x)
            x = Down(32, self.dtype, name="d2")(x)
            x = Down(self.out_channels, self.dtype, name="d3")(x)
            return x
        raise ValueError("image_mode must be 'downsample' or 'conv'")
