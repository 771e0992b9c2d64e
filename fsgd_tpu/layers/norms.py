"""Normalization layers for NHWC feature maps.

Parity with detectron2/layers/batch_norm.py: ``FrozenBatchNorm`` (inference
affine from fixed statistics — the default ResNet norm for detection) and
``get_norm`` dispatch ("BN"/"SyncBN"/"FrozenBN"/"GN"/"").  On TPU, SyncBN is
ordinary BatchNorm with a cross-replica ``axis_name`` so XLA emits the psum
(replacing NaiveSyncBatchNorm's explicit allreduce).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine parameters frozen.

    out = (x - mean) / sqrt(var + eps) * weight + bias, with stop_gradient on
    every parameter (reference FrozenBatchNorm2d semantics).  Parameters live
    in the normal 'params' collection so zoo checkpoints can populate them,
    but gradients are always zero.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        weight, bias, mean, var = jax.tree.map(jax.lax.stop_gradient, (weight, bias, mean, var))
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class SyncBatchNorm(nn.Module):
    """BatchNorm whose statistics are averaged over the data-parallel axis."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.9
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        bn = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.eps,
            axis_name=self.axis_name,
            dtype=x.dtype,
            param_dtype=jnp.float32,
        )
        return bn(x)


def get_norm(norm: str, out_channels: int, axis_name: Optional[str] = None,
             name: Optional[str] = None):
    """Return a norm module instance by config string, or None for ''."""
    if norm == "" or norm is None:
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features=out_channels, name=name)
    if norm == "GN":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, param_dtype=jnp.float32, name=name)
    if norm in ("BN", "SyncBN", "naiveSyncBN"):
        return SyncBatchNorm(
            features=out_channels,
            axis_name=axis_name if norm != "BN" else None,
            name=name,
        )
    raise ValueError("Unknown norm type: {}".format(norm))
