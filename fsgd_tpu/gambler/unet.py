"""U-Net zoo for the gambler, in flax.linen (NHWC).

Parity with ImbalanceDetection/imbalancedetection/modelling/unet.py:9-377:
``UNet`` (4-down/4-up, sigmoid output), ``LayeredUnet`` (per-FPN-level inputs
concatenated at each Down via ``DownCat``, transposed-conv ``UpCat``,
returning all five decoder levels), the ``DoubleConv``/``Down``/``Up``/
``OutConv`` parts and the pix2pix-style ``UnetGenerator``.

TPU note: the reference's BatchNorm2d always runs in training mode inside the
GAN loop; we implement that exactly as a *stateless* batch-statistics norm
(normalize by the current batch's mean/var + learned affine) — no running
buffers, no mutable collections, fully functional.
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TrainModeBatchNorm(nn.Module):
    """BatchNorm that always normalizes by the current batch statistics."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale.astype(y.dtype) + bias.astype(y.dtype)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> relu) x 2."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, param_dtype=jnp.float32, name="conv{}".format(i),
            )(x)
            x = TrainModeBatchNorm(self.out_channels, name="bn{}".format(i))(x)
            x = nn.relu(x)
        return x


def _maxpool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _linear_taps(pos: jnp.ndarray, size: int, dtype):
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size - 1)
    hi = jnp.clip(lo + 1, 0, size - 1)
    t = (pos - jnp.floor(pos)).astype(dtype)
    return lo, hi, t


def torch_bilinear_downsample(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """``F.interpolate(scale_factor=1/stride, mode='bilinear')`` parity
    (align_corners=False, NO antialias): sample the bilinear interpolant at
    (i + 0.5) * stride - 0.5 — unlike ``jax.image.resize``, which applies an
    antialiasing triangle filter when downsampling."""
    n, h, w, c = x.shape
    oh, ow = h // stride, w // stride
    ylo, yhi, ty = _linear_taps((jnp.arange(oh) + 0.5) * stride - 0.5, h, x.dtype)
    xlo, xhi, tx = _linear_taps((jnp.arange(ow) + 0.5) * stride - 0.5, w, x.dtype)
    top = x[:, ylo] * (1 - ty)[None, :, None, None] + x[:, yhi] * ty[None, :, None, None]
    return (
        top[:, :, xlo] * (1 - tx)[None, None, :, None]
        + top[:, :, xhi] * tx[None, None, :, None]
    )


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``
    parity: out position i maps to source i * (h-1) / (2h-1)."""
    n, h, w, c = x.shape
    if h == 1 and w == 1:
        return jnp.broadcast_to(x, (n, 2, 2, c))
    py = jnp.arange(2 * h) * ((h - 1) / max(2 * h - 1, 1))
    px = jnp.arange(2 * w) * ((w - 1) / max(2 * w - 1, 1))
    ylo, yhi, ty = _linear_taps(py, h, x.dtype)
    xlo, xhi, tx = _linear_taps(px, w, x.dtype)
    top = x[:, ylo] * (1 - ty)[None, :, None, None] + x[:, yhi] * ty[None, :, None, None]
    return (
        top[:, :, xlo] * (1 - tx)[None, None, :, None]
        + top[:, :, xhi] * tx[None, None, :, None]
    )


def _pad_or_crop_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Symmetrically pad (or crop) NHWC spatial dims to (h, w)
    (reference's F.pad with possibly-negative diffs)."""
    dh = h - x.shape[1]
    dw = w - x.shape[2]
    if dh == 0 and dw == 0:
        return x
    # crop first if negative
    if dh < 0:
        top = (-dh) // 2
        x = x[:, top : top + h, :, :]
        dh = 0
    if dw < 0:
        left = (-dw) // 2
        x = x[:, :, left : left + w, :]
        dw = 0
    if dh > 0 or dw > 0:
        x = jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
    return x


class Down(nn.Module):
    """maxpool then DoubleConv."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return DoubleConv(self.out_channels, self.dtype, name="conv")(_maxpool2(x))


class DownCat(nn.Module):
    """maxpool, pad to the level's prediction size, concat, DoubleConv."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pred, x):
        out1 = _maxpool2(x)
        out1 = _pad_or_crop_to(out1, pred.shape[1], pred.shape[2])
        return DoubleConv(self.out_channels, self.dtype, name="conv")(
            jnp.concatenate([pred, out1], axis=-1)
        )


class Up(nn.Module):
    """bilinear-2x (or transposed conv) upsample, concat skip, DoubleConv."""

    out_channels: int
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        if self.bilinear:
            x1 = upsample2x_align_corners(x1)  # reference: align_corners=True
        else:
            x1 = nn.ConvTranspose(
                x1.shape[-1] // 2, (2, 2), strides=(2, 2),
                dtype=self.dtype, param_dtype=jnp.float32, name="up",
            )(x1)
        x1 = _pad_or_crop_to(x1, x2.shape[1], x2.shape[2])
        return DoubleConv(self.out_channels, self.dtype, name="conv")(
            jnp.concatenate([x2, x1], axis=-1)
        )


class UpCat(nn.Module):
    """Transposed-conv upsample halving channels, concat skip, DoubleConv."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        x1 = nn.ConvTranspose(
            x1.shape[-1] // 2, (2, 2), strides=(2, 2),
            dtype=self.dtype, param_dtype=jnp.float32, name="up",
        )(x1)
        x1 = _pad_or_crop_to(x1, x2.shape[1], x2.shape[2])
        return DoubleConv(self.out_channels, self.dtype, name="conv")(
            jnp.concatenate([x2, x1], axis=-1)
        )


class OutConv(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv"
        )(x)


class UNet(nn.Module):
    """Plain 4-down/4-up U-Net with sigmoid output (reference unet.py:9-56)."""

    out_channels: int
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = DoubleConv(64, self.dtype, name="inc")(x)
        x2 = Down(128, self.dtype, name="down1")(x1)
        x3 = Down(256, self.dtype, name="down2")(x2)
        x4 = Down(512, self.dtype, name="down3")(x3)
        x5 = Down(512, self.dtype, name="down4")(x4)
        x = Up(256, self.bilinear, self.dtype, name="up1")(x5, x4)
        x = Up(128, self.bilinear, self.dtype, name="up2")(x, x3)
        x = Up(64, self.bilinear, self.dtype, name="up3")(x, x2)
        x = Up(64, self.bilinear, self.dtype, name="up4")(x, x1)
        logits = OutConv(self.out_channels, self.dtype, name="outc")(x)
        return jax.nn.sigmoid(logits)


class LayeredUnet(nn.Module):
    """U-Net over N FPN scales: each Down concatenates that level's
    prediction map; returns all decoder levels deepest-first, e.g.
    [p7, p6, p5, p4, p3] for the production 5-scale pyramid
    (reference unet.py:59-143, fixed at five scales there; generalized to
    ``len(layered_x)`` scales with the same names/channels for N=5 so
    5-scale checkpoints are unchanged)."""

    img_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layered_x: List[jnp.ndarray], image: Optional[jnp.ndarray]):
        n = len(layered_x)
        assert n >= 2, "LayeredUnet needs at least two pyramid scales"
        if image is None:
            x = DoubleConv(64, self.dtype, name="inc")(layered_x[0])
        else:
            assert image.shape[1:3] == layered_x[0].shape[1:3]
            x = DoubleConv(64, self.dtype, name="inc")(
                jnp.concatenate([layered_x[0], image], axis=-1)
            )
        skips = [x]
        for i in range(1, n):
            x = DownCat(min(64 * 2 ** i, 1024), self.dtype, name="down{}".format(i))(
                layered_x[i], x
            )
            skips.append(x)
        outs = [x]
        for i in range(1, n):
            # out channels follow the skip's width (512,256,128,64 for N=5)
            x = UpCat(max(skips[-1 - i].shape[-1], 64), self.dtype,
                      name="up{}".format(i))(x, skips[-1 - i])
            outs.append(x)
        return outs


class UnetSkipConnectionBlock(nn.Module):
    """pix2pix recursive skip block (reference unet.py:296-377)."""

    outer_nc: int
    inner_nc: int
    submodule: Optional["UnetSkipConnectionBlock"] = None
    outermost: bool = False
    innermost: bool = False
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = (k - 1) // 2
        down = nn.Conv(
            self.inner_nc, (k, k), strides=(2, 2), padding=((p, p), (p, p)),
            dtype=self.dtype, param_dtype=jnp.float32, name="downconv",
        )
        # flax ConvTranspose explicit pads are p_flax = k-1-p_torch; the
        # upconvs mirror torch ConvTranspose2d(k, 2, p) (out = 2*in for
        # k=4, p=1), see keypoint_head.py for the derivation
        if self.outermost:
            y = down(x)
            y = self.submodule(y)
            y = nn.ConvTranspose(self.outer_nc, (k, k), strides=(2, 2), padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
                                 dtype=self.dtype, param_dtype=jnp.float32, name="upconv")(nn.relu(y))
            y = _pad_or_crop_to(y, x.shape[1], x.shape[2])
            return jax.nn.sigmoid(y)
        if self.innermost:
            y = down(nn.leaky_relu(x, 0.2))
            y = nn.ConvTranspose(self.outer_nc, (k, k), strides=(2, 2), padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
                                 dtype=self.dtype, param_dtype=jnp.float32, name="upconv")(nn.relu(y))
            y = TrainModeBatchNorm(self.outer_nc, name="upnorm")(y)
            y = _pad_or_crop_to(y, x.shape[1], x.shape[2])
            return jnp.concatenate([x, y], axis=-1)
        y = down(nn.leaky_relu(x, 0.2))
        y = TrainModeBatchNorm(self.inner_nc, name="downnorm")(y)
        y = self.submodule(y)
        y = nn.ConvTranspose(self.outer_nc, (k, k), strides=(2, 2), padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
                             dtype=self.dtype, param_dtype=jnp.float32, name="upconv")(nn.relu(y))
        y = TrainModeBatchNorm(self.outer_nc, name="upnorm")(y)
        y = _pad_or_crop_to(y, x.shape[1], x.shape[2])
        return jnp.concatenate([x, y], axis=-1)


class UnetGenerator(nn.Module):
    """pix2pix U-Net generator (reference unet.py:266-294)."""

    out_channels: int
    num_downs: int = 5
    ngf: int = 64
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block = UnetSkipConnectionBlock(
            self.ngf * 8, self.ngf * 8, innermost=True, kernel_size=self.kernel_size, dtype=self.dtype
        )
        for _ in range(self.num_downs - 5):
            block = UnetSkipConnectionBlock(
                self.ngf * 8, self.ngf * 8, submodule=block, kernel_size=self.kernel_size, dtype=self.dtype
            )
        block = UnetSkipConnectionBlock(self.ngf * 4, self.ngf * 8, submodule=block, kernel_size=self.kernel_size, dtype=self.dtype)
        block = UnetSkipConnectionBlock(self.ngf * 2, self.ngf * 4, submodule=block, kernel_size=self.kernel_size, dtype=self.dtype)
        block = UnetSkipConnectionBlock(self.ngf, self.ngf * 2, submodule=block, kernel_size=self.kernel_size, dtype=self.dtype)
        block = UnetSkipConnectionBlock(
            self.out_channels, self.ngf, submodule=block, outermost=True, kernel_size=self.kernel_size, dtype=self.dtype
        )
        return block(x)
