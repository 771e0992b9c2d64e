"""Box feature head and output layers.

Parity with detectron2/modeling/roi_heads/box_head.py:20-105
(``FastRCNNConvFCHead``) and fast_rcnn.py:344-381 (``FastRCNNOutputLayers``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...layers.norms import get_norm
from ..build import ROI_BOX_HEAD_REGISTRY

# caffe2 XavierFill for convs, and fc init
xavier_init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


@ROI_BOX_HEAD_REGISTRY.register()
class FastRCNNConvFCHead(nn.Module):
    """N conv3x3(+norm+relu) then M fc(+relu) on pooled (P, PH, PW, C) features."""

    num_conv: int
    conv_dim: int
    num_fc: int
    fc_dim: int
    norm: str = ""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (N, PH, PW, C)
        for i in range(self.num_conv):
            x = nn.Conv(
                self.conv_dim,
                (3, 3),
                padding=((1, 1), (1, 1)),
                use_bias=(self.norm == ""),
                kernel_init=xavier_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv{}".format(i),
            )(x)
            norm = get_norm(self.norm, self.conv_dim)
            if norm is not None:
                x = norm(x)
            x = nn.relu(x)
        if self.num_fc:
            x = x.reshape(x.shape[0], -1)
            for i in range(self.num_fc):
                x = nn.Dense(
                    self.fc_dim,
                    kernel_init=xavier_init,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="fc{}".format(i),
                )(x)
                x = nn.relu(x)
        return x


class FastRCNNOutputLayers(nn.Module):
    """Linear cls (K+1) and box regression (K*B or B) predictors."""

    num_classes: int
    box_dim: int = 4
    cls_agnostic_bbox_reg: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        scores = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="cls_score",
        )(x)
        num_bbox_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_bbox_reg * self.box_dim,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bbox_pred",
        )(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)
