"""Space-to-depth stem rewrite: exact equivalence to the direct 7x7/2 conv.

The rewrite (fsgd_tpu/models/backbone/resnet.py S2DConv7x7) computes the
reference stem convolution (detectron2/modeling/backbone/resnet.py:356-370,
BasicStem: Conv2d(3, 64, 7, stride=2, padding=3)) as a 4x4 stride-1 conv over
the 2x2 space-to-depth input — same products, reassociated, MXU-friendlier
contraction.  These tests pin bitwise-tight fp32 agreement with the direct
convolution, the odd-shape fallback, gradients, and the param-tree layout
(checkpoint parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsgd_tpu.models.backbone.resnet import S2DConv7x7


def _direct(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("hw", [(64, 96), (50, 70), (2, 2)])
def test_s2d_matches_direct_conv(hw):
    h, w = hw
    mod = S2DConv7x7(features=16, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, h, w, 3), jnp.float32)
    params = mod.init(key, x)
    got = mod.apply(params, x)
    want = _direct(x, params["params"]["kernel"])
    assert got.shape == want.shape == (2, h // 2 + h % 2, w // 2 + w % 2, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_s2d_odd_shape_fallback_exact():
    mod = S2DConv7x7(features=8, dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 33, 47, 3), jnp.float32)
    params = mod.init(key, x)
    got = mod.apply(params, x)
    want = _direct(x, params["params"]["kernel"])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_s2d_gradients_match_direct():
    mod = S2DConv7x7(features=8, dtype=jnp.float32)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 32, 48, 3), jnp.float32)
    params = mod.init(key, x)

    def loss_s2d(p, xx):
        return jnp.sum(mod.apply(p, xx) ** 2)

    def loss_direct(p, xx):
        return jnp.sum(_direct(xx, p["params"]["kernel"]) ** 2)

    g1 = jax.grad(loss_s2d)(params, x)["params"]["kernel"]
    g2 = jax.grad(loss_direct)(params, x)["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-3)


def test_stem_param_tree_unchanged():
    """The rewrite must keep the canonical (7,7,3,64) kernel at the same path
    (zoo/.pkl checkpoint parity: torch_loader maps stem weights by name)."""
    from fsgd_tpu.models.backbone.resnet import BasicStem

    for s2d in (True, False):
        stem = BasicStem(64, "FrozenBN", jnp.float32, s2d=s2d)
        params = stem.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        kernel = params["params"]["stem_conv1"]["conv"]["kernel"]
        assert kernel.shape == (7, 7, 3, 64)


def test_stem_s2d_config_toggle_same_output():
    """Same params -> same stem output with the rewrite on or off."""
    from fsgd_tpu.models.backbone.resnet import BasicStem

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 96, 3), jnp.float32)
    on = BasicStem(64, "FrozenBN", jnp.float32, s2d=True)
    off = BasicStem(64, "FrozenBN", jnp.float32, s2d=False)
    params = on.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(on.apply(params, x)), np.asarray(off.apply(params, x)),
        rtol=1e-5, atol=1e-5,
    )
