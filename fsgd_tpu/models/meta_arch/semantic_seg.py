"""Semantic segmentation meta-arch + FPN head.

Parity with detectron2/modeling/meta_arch/semantic_seg.py:27-180:
``SemSegFPNHead`` (per-level conv/GN/relu towers progressively upsampled to
COMMON_STRIDE, summed, 1x1 predictor) and ``SemanticSegmentor`` (backbone +
head, pixel CE with IGNORE_VALUE).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...layers.norms import get_norm
from ..build import META_ARCH_REGISTRY, SEM_SEG_HEADS_REGISTRY, build_backbone
from ..postprocessing import scale_detections  # noqa: F401 (api surface)
from .detector_base import DetectorBase

msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


@SEM_SEG_HEADS_REGISTRY.register()
class SemSegFPNHead(nn.Module):
    in_strides: Sequence[int]  # strides of in_features, e.g. (4, 8, 16, 32)
    num_classes: int
    convs_dim: int = 128
    common_stride: int = 4
    norm: str = "GN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> jnp.ndarray:
        """features: per-level NHWC maps (finest first). Returns logits at
        common_stride resolution: (B, H/cs, W/cs, num_classes)."""
        import math

        outputs = []
        for i, (feat, stride) in enumerate(zip(features, self.in_strides)):
            head_length = max(1, int(math.log2(stride) - math.log2(self.common_stride)))
            x = feat
            for k in range(head_length):
                x = nn.Conv(
                    self.convs_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=(self.norm == ""), kernel_init=msra_init,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="l{}_conv{}".format(i, k),
                )(x)
                norm = get_norm(self.norm, self.convs_dim,
                                name="l{}_norm{}".format(i, k))
                if norm is not None:
                    x = norm(x)
                x = nn.relu(x)
                if stride != self.common_stride:
                    n, h, w, c = x.shape
                    x = jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear")
                    stride //= 2
            outputs.append(x)
        x = sum(outputs)
        x = nn.Conv(
            self.num_classes, (1, 1), kernel_init=msra_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="predictor",
        )(x)
        return x.astype(jnp.float32)


def sem_seg_loss(logits: jnp.ndarray, gt: jnp.ndarray, ignore_value: int, common_stride: int) -> jnp.ndarray:
    """Pixel CE at full resolution against (B, H, W) int GT."""
    n, h, w, c = logits.shape
    full = jax.image.resize(logits, (n, h * common_stride, w * common_stride, c), method="bilinear")
    gt = gt[:, : full.shape[1], : full.shape[2]]
    valid = gt != ignore_value
    safe_gt = jnp.where(valid, gt, 0)
    log_probs = jax.nn.log_softmax(full, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_gt[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


class SemSegHeadWrapper:
    """Functional wrapper owning the head module + loss config."""

    def __init__(self, cfg, input_shapes: Dict):
        self.in_features = list(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES)
        self.ignore_value = cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE
        self.common_stride = cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE
        self.loss_weight = cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        strides = [input_shapes[f].stride for f in self.in_features]
        self.module = SemSegFPNHead(
            in_strides=tuple(strides),
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            convs_dim=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            common_stride=self.common_stride,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            dtype=dtype,
        )

    def init_params(self, rng, feature_shapes: List):
        dummies = [jnp.zeros((1, h, w, c), jnp.float32) for (h, w, c) in feature_shapes]
        return self.module.init(rng, dummies)["params"]

    def __call__(self, params, features: Dict, batch, training: bool):
        feats = [features[f] for f in self.in_features]
        logits = self.module.apply({"params": params}, feats)
        losses = {}
        if training:
            losses["loss_sem_seg"] = (
                sem_seg_loss(logits, batch["gt_sem_seg"], self.ignore_value, self.common_stride)
                * self.loss_weight
            )
        return logits, losses


@META_ARCH_REGISTRY.register()
class SemanticSegmentor(DetectorBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.backbone = build_backbone(cfg)
        self.module = self.backbone
        self.sem_seg_head = SemSegHeadWrapper(cfg, self.backbone.output_shape())

    def init_params(self, rng, image_size=(128, 128), batch: int = 1):
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((batch, image_size[0], image_size[1], 3), jnp.float32)
        backbone_params = self.backbone.init(r1, dummy)["params"]
        feats = self.backbone.apply({"params": backbone_params}, dummy)
        shapes = [tuple(feats[f].shape[1:]) for f in self.sem_seg_head.in_features]
        return {"backbone": backbone_params, "sem_seg_head": self.sem_seg_head.init_params(r2, shapes)}

    def loss_fn(self, params, batch, rng=None):
        images = self.normalize(batch["image"])
        features = self.backbone.apply({"params": params["backbone"]}, images)
        _, losses = self.sem_seg_head(params["sem_seg_head"], features, batch, True)
        return sum(losses.values()), losses

    def inference_fn(self, params, batch):
        images = self.normalize(batch["image"])
        features = self.backbone.apply({"params": params["backbone"]}, images)
        logits, _ = self.sem_seg_head(params["sem_seg_head"], features, batch, False)
        n, h, w, c = logits.shape
        cs = self.sem_seg_head.common_stride
        return jax.image.resize(logits, (n, h * cs, w * cs, c), method="bilinear")

    # -- detectron2-style host API (reference semantic_seg.py:75-102) --------
    def __call__(self, batched_inputs):
        import numpy as np

        batch = {k: jnp.asarray(v) for k, v in self.prepare_batch(batched_inputs).items()}
        if self.training:
            fwd = self._jitted("loss", self.loss_fn)
            total, losses = fwd(self.params, batch)
            return losses
        fwd = self._jitted("inference", self.inference_fn)
        logits = fwd(self.params, batch)
        out = []
        for i in range(logits.shape[0]):
            out.append({"sem_seg": sem_seg_postprocess_host(
                logits[i],
                (int(batch["image_size"][i, 0]), int(batch["image_size"][i, 1])),
                (int(batch["out_size"][i, 0]), int(batch["out_size"][i, 1])),
            )})
        return out


def sem_seg_postprocess_host(logits, image_size, out_size):
    """Crop padded logits to the true image area and rescale to the output
    resolution (reference postprocessing.py sem_seg_postprocess), host-side.

    logits: (H, W, C); returns (out_h, out_w, C) numpy float32.
    """
    import numpy as np

    th, tw = image_size
    cropped = jnp.asarray(logits)[:th, :tw]
    resized = jax.image.resize(
        cropped, (out_size[0], out_size[1], cropped.shape[-1]), method="bilinear"
    )
    return np.asarray(resized, np.float32)
