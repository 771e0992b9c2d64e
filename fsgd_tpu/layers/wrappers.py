"""Small tensor helpers (parity with detectron2/layers/wrappers.py ``cat`` and
the nearest-2x ``interpolate`` used by FPN's top-down pathway)."""

import jax.numpy as jnp


def cat(tensors, axis=0):
    if len(tensors) == 1:
        return tensors[0]
    return jnp.concatenate(tensors, axis=axis)


def interpolate_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample of an NHWC tensor (FPN top-down path).

    Implemented as reshape+broadcast (no gather), which XLA fuses into the
    following add; matches F.interpolate(scale_factor=2, mode="nearest").
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
