"""The jitted train step: forward + loss + grad + collective + update.

This is the TPU-native equivalent of the reference's hot loop
(SimpleTrainer.run_step, detectron2/engine/train_loop.py:198-233: forward,
sum losses, NaN check, backward, clip_grad_norm_(10), optimizer step) — but
as ONE compiled XLA program.  Under a data mesh the batch arrives sharded on
the "data" axis; because the loss reduces over the global batch, XLA inserts
the gradient all-reduce over ICI automatically (no explicit NCCL/DDP).

The NaN guard (_detect_anomaly, train_loop.py:235-241) is functional: when
the total loss is non-finite the update is skipped and ``metrics["nonfinite"]``
flips to 1 for the host-side trainer to raise on.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["TrainState", "make_train_step", "make_eval_step"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def create_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, Dict]]:
    """Build the jitted ``(state, batch, rng) -> (state, metrics)`` step.

    loss_fn: (params, batch, rng) -> (total_loss, loss_dict).
    """

    def step_fn(state: TrainState, batch, rng):
        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch, rng)
        finite = jnp.isfinite(total)
        # skip the update entirely on non-finite loss (functional detect_anomaly)
        safe_grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = optimizer.update(safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree.map(lambda n, o: jnp.where(finite, n, o), new_params, state.params)
        new_state = TrainState(new_params, new_opt_state, state.step + 1)

        gnorm = optax.global_norm(grads)
        metrics = {"total_loss": total, "grad_norm": gnorm, "nonfinite": (~finite).astype(jnp.float32)}
        metrics.update(loss_dict)
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        batch_sharding = data  # applied leaf-wise: shard dim 0
        return jax.jit(
            step_fn,
            in_shardings=(repl, batch_sharding, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(inference_fn: Callable, mesh: Optional[Mesh] = None) -> Callable:
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(inference_fn, in_shardings=(repl, data), out_shardings=data)
    return jax.jit(inference_fn)
