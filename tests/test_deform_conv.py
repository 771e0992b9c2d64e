"""Deformable conv tests: zero offsets must reproduce a standard conv
(the invariant the reference CUDA kernels are validated against)."""

import numpy as np

import jax
import jax.numpy as jnp

from fsgd_tpu.ops.deform_conv import deform_conv2d


def _ref_conv(x, w, stride=1, padding=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class TestDeformConv:
    def test_zero_offsets_equal_conv(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 9, 9, 4).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
        offset = jnp.zeros((2, 9, 9, 1 * 9 * 2), jnp.float32)
        out = deform_conv2d(x, offset, w, stride=1, padding=1)
        ref = _ref_conv(x, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_zero_offsets_stride2(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 10, 10, 3).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 3, 5).astype(np.float32))
        ho = (10 + 2 - 3) // 2 + 1
        offset = jnp.zeros((1, ho, ho, 18), jnp.float32)
        out = deform_conv2d(x, offset, w, stride=2, padding=1)
        ref = _ref_conv(x, w, stride=2)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_modulated_mask_ones_equal_v1(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 4, 4).astype(np.float32))
        offset = jnp.asarray(rng.randn(1, 8, 8, 18).astype(np.float32)) * 0.5
        v1 = deform_conv2d(x, offset, w)
        v2 = deform_conv2d(x, offset, w, mask=jnp.ones((1, 8, 8, 9)))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)

    def test_integer_offset_shift(self):
        """Offset (0, +1) everywhere = convolving the x-shifted image."""
        rng = np.random.RandomState(3)
        x = np.zeros((1, 8, 8, 1), np.float32)
        x[0, :, :-1, 0] = rng.rand(8, 7)
        w = jnp.asarray(rng.rand(3, 3, 1, 1).astype(np.float32))
        offset = jnp.tile(jnp.asarray([0.0, 1.0]), (1, 8, 8, 9)).reshape(1, 8, 8, 18)
        out = deform_conv2d(jnp.asarray(x), offset, w)
        shifted = np.zeros_like(x)
        shifted[0, :, :-1] = x[0, :, 1:]
        ref = _ref_conv(jnp.asarray(shifted), w)
        # interior pixels must match exactly (borders differ by padding semantics)
        np.testing.assert_allclose(np.asarray(out)[0, 2:-2, 2:-2], np.asarray(ref)[0, 2:-2, 2:-2], atol=1e-4)

    def test_grad_flows(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.rand(1, 6, 6, 2).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 2, 2).astype(np.float32))
        offset = jnp.asarray(rng.randn(1, 6, 6, 18).astype(np.float32)) * 0.1

        def f(o):
            return jnp.sum(deform_conv2d(x, o, w) ** 2)

        g = jax.grad(f)(offset)
        assert float(jnp.abs(g).max()) > 0

    def test_deform_backbone_builds(self):
        from fsgd_tpu.config import get_cfg
        from fsgd_tpu.models import build_backbone

        cfg = get_cfg()
        cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, False, True]
        cfg.MODEL.RESNETS.DEFORM_MODULATED = True
        cfg.MODEL.RESNETS.OUT_FEATURES = ["res5"]
        cfg.TPU.COMPUTE_DTYPE = "float32"
        backbone = build_backbone(cfg)
        params = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
        out = backbone.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
        assert out["res5"].shape == (1, 2, 2, 2048)
        # offset conv exists and is zero-initialized
        off = params["res5_block0"]["conv2_offset"]["kernel"]
        assert float(jnp.abs(off).max()) == 0.0
