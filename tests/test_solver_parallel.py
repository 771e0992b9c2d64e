"""Solver and multi-device train-step tests (8-device virtual CPU mesh)."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from fsgd_tpu.config import get_cfg
from fsgd_tpu.solver import WarmupCosineLR, WarmupMultiStepLR, build_sgd_optimizer, classify_params
from fsgd_tpu.parallel import (
    TrainState,
    create_mesh,
    create_train_state,
    make_train_step,
    shard_batch,
)


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), name="conv")(x)
        x = nn.GroupNorm(num_groups=2, name="gn")(x)
        x = nn.relu(x)
        return nn.Dense(1, name="fc")(x.mean(axis=(1, 2)))


def _toy_setup():
    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    return model, params


class TestSchedulers:
    def test_warmup_multistep(self):
        s = WarmupMultiStepLR(0.01, [10, 20], gamma=0.1, warmup_factor=0.1, warmup_iters=5)
        assert abs(s(0) - 0.001) < 1e-9  # warmup start
        assert abs(s(5) - 0.01) < 1e-9  # warmup done
        assert abs(s(9) - 0.01) < 1e-9
        assert abs(s(10) - 0.001) < 1e-9  # first decay
        assert abs(s(25) - 0.0001) < 1e-9  # second decay
        # traced variant agrees
        assert abs(float(s(jnp.asarray(25))) - 0.0001) < 1e-9

    def test_warmup_cosine(self):
        s = WarmupCosineLR(0.01, max_iters=100, warmup_iters=0)
        assert abs(s(0) - 0.01) < 1e-9
        assert s(50) < 0.006
        assert s(99) < 1e-4


class TestOptimizer:
    def test_classify_params(self):
        _, params = _toy_setup()
        is_bias, is_norm = classify_params(params)
        assert is_bias["conv"]["bias"] is True
        assert is_bias["conv"]["kernel"] is False
        assert is_norm["gn"]["scale"] is True
        assert is_norm["gn"]["bias"] is True

    def test_sgd_matches_torch_semantics(self):
        """One step of coupled-WD SGD: p' = p - lr * (g + wd*p) (no momentum hist)."""
        _, params = _toy_setup()
        lr, wd = 0.1, 0.01
        opt = build_sgd_optimizer(
            params,
            base_lr_schedule=lambda s: lr,
            momentum=0.9,
            weight_decay=wd,
            weight_decay_norm=0.0,
            weight_decay_bias=0.0,
            clip_grad_norm=None,
        )
        opt_state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        k, nk = params["conv"]["kernel"], new_params["conv"]["kernel"]
        np.testing.assert_allclose(np.asarray(nk), np.asarray(k - lr * (1.0 + wd * k)), rtol=1e-6)
        # norm params got no weight decay
        g, ng = params["gn"]["scale"], new_params["gn"]["scale"]
        np.testing.assert_allclose(np.asarray(ng), np.asarray(g - lr * 1.0), rtol=1e-6)

    def test_bias_lr_factor(self):
        _, params = _toy_setup()
        opt = build_sgd_optimizer(
            params,
            base_lr_schedule=lambda s: 0.1,
            momentum=0.0,
            weight_decay=0.0,
            weight_decay_norm=0.0,
            weight_decay_bias=0.0,
            bias_lr_factor=2.0,
            clip_grad_norm=None,
        )
        opt_state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, opt_state, params)
        assert abs(float(updates["conv"]["bias"][0]) + 0.2) < 1e-6
        assert abs(float(updates["conv"]["kernel"][0, 0, 0, 0]) + 0.1) < 1e-6


class TestTrainStepMesh:
    def test_data_parallel_step_8_devices(self):
        assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
        model, params = _toy_setup()

        def loss_fn(p, batch, rng):
            pred = model.apply({"params": p}, batch["x"])
            loss = jnp.mean((pred[:, 0] - batch["y"]) ** 2)
            return loss, {"mse": loss}

        opt = build_sgd_optimizer(
            params, base_lr_schedule=lambda s: 0.01, momentum=0.9,
            weight_decay=1e-4, weight_decay_norm=0.0, weight_decay_bias=0.0,
        )
        mesh = create_mesh(("data",))
        assert mesh.shape["data"] == 8
        step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
        state = create_train_state(params, opt)

        rng = np.random.RandomState(0)
        batch = {"x": rng.rand(16, 8, 8, 3).astype(np.float32), "y": rng.rand(16).astype(np.float32)}
        sharded = shard_batch(batch, mesh)
        losses = []
        for i in range(3):
            state, metrics = step(state, sharded, jax.random.PRNGKey(i))
            losses.append(float(metrics["mse"]))
            assert float(metrics["nonfinite"]) == 0.0
        assert losses[2] < losses[0]  # learning on a fixed batch
        assert int(state.step) == 3

        # sharded-vs-single-device equivalence: same batch, no mesh
        step1 = make_train_step(loss_fn, opt, mesh=None, donate=False)
        state1 = create_train_state(params, opt)
        state1, metrics1 = step1(state1, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(losses[0], float(metrics1["mse"]), rtol=1e-5)

    def test_nonfinite_loss_skips_update(self):
        model, params = _toy_setup()

        def loss_fn(p, batch, rng):
            bad = jnp.where(batch["poison"], jnp.nan, 0.0)
            pred = model.apply({"params": p}, batch["x"])
            loss = jnp.mean(pred ** 2) + bad
            return loss, {}

        opt = optax.sgd(0.1)
        step = make_train_step(loss_fn, opt, donate=False)
        state = create_train_state(params, opt)
        batch = {"x": np.ones((2, 8, 8, 3), np.float32), "poison": np.array(True)}
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert float(metrics["nonfinite"]) == 1.0
        # params unchanged
        chex_equal = jax.tree.map(lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), state.params, new_state.params)
        assert all(jax.tree_util.tree_leaves(chex_equal))
