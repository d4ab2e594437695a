"""The jitted SPMD train/eval step.

Replaces the reference's Lightning training loop body (training_step +
DDP allreduce + every-10th-batch optimizer step, reference
medmoe_module.py:318-339 + configs/experiment/pretraining_medmoe.yaml:23):

  * gradient accumulation is a ``lax.scan`` over stacked micro-batches
    INSIDE one jitted step — one compiled program, zero host round-trips;
  * gradient reduction across the data axis falls out of sharded autodiff
    (XLA inserts the psum the reference gets from NCCL allreduce);
  * gradient clipping + Adam run on the accumulation-averaged gradients,
    matching Lightning's clip-then-step-on-accumulated semantics.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medmoe_tpu.parallel.spmd import spmd_context
from medmoe_tpu.train.state import TrainState


def build_train_step(module, mesh: Optional[Mesh] = None,
                     accum_steps: int = 1, donate: bool = True) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    With accum_steps > 1, ``batch`` arrays carry a leading [accum_steps,
    micro_batch, ...] layout (the trainer stacks consecutive loader batches);
    the micro axis is the one sharded over 'data'. With accum_steps=1 the
    batch is just [B, ...].
    """

    uses_tool = bool(getattr(module, "uses_tool_bert", False))

    def loss_for_micro(params, micro_batch, rng, tool):
        kw = {"tool_params": tool} if uses_tool else {}
        return module.loss_fn(params, micro_batch, deterministic=False,
                              rngs={"dropout": rng}, **kw)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                rng: jax.Array, tool
                ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # declare the ambient mesh at trace time so Pallas wrappers can
        # shard_map themselves over the data axis (parallel/spmd.py)
        with spmd_context(mesh):
            return _step_body(state, batch, rng, tool)

    def _step_body(state, batch, rng, tool):
        grad_fn = jax.grad(loss_for_micro, has_aux=True)

        if accum_steps > 1:
            rngs = jax.random.split(rng, accum_steps)

            def scan_body(carry, inputs):
                grads_acc, metrics_acc = carry
                micro, micro_rng = inputs
                grads, metrics = grad_fn(state.params, micro, micro_rng,
                                         tool)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc,
                                                     metrics)
                return (grads_acc, metrics_acc), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            first_micro = jax.tree_util.tree_map(lambda x: x[0], batch)
            metrics_shape = jax.eval_shape(
                lambda p, b, r: grad_fn(p, b, r, tool)[1],
                state.params, first_micro, rngs[0])
            zero_metrics = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape)
            (grads, metrics), _ = jax.lax.scan(
                scan_body, (zero_grads, zero_metrics), (batch, rngs))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)
        else:
            grads, metrics = grad_fn(state.params, batch, rng, tool)

        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = jnp.sqrt(sum(
            jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads)))
        return new_state, metrics

    if mesh is not None:
        if accum_steps > 1:
            batch_spec = NamedSharding(mesh, P(None, "data"))
        else:
            batch_spec = NamedSharding(mesh, P("data"))
        jitted = jax.jit(step_fn,
                         in_shardings=(None, batch_spec, None, None),
                         donate_argnums=(0,) if donate else ())
    else:
        jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    # the frozen soft-label tool tree (if any) rides as a real jit argument —
    # never a baked-in compile-time constant — and is re-read per call
    def step(state, batch, rng):
        return jitted(state, batch, rng,
                      getattr(module, "tool_bert_params", None))

    step.lower = lambda state, batch, rng: jitted.lower(
        state, batch, rng, getattr(module, "tool_bert_params", None))
    return step


def build_eval_step(module, mesh: Optional[Mesh] = None) -> Callable:
    """Returns eval_step(params, batch) -> metrics (no grads)."""

    uses_tool = bool(getattr(module, "uses_tool_bert", False))

    def eval_fn(params, batch, tool):
        kw = {"tool_params": tool} if uses_tool else {}
        with spmd_context(mesh):
            _, metrics = module.loss_fn(params, batch, deterministic=True,
                                        **kw)
        return metrics

    if mesh is not None:
        batch_spec = NamedSharding(mesh, P("data"))
        jitted = jax.jit(eval_fn, in_shardings=(None, batch_spec, None))
    else:
        jitted = jax.jit(eval_fn)

    def eval_step(params, batch):
        return jitted(params, batch,
                      getattr(module, "tool_bert_params", None))

    return eval_step
