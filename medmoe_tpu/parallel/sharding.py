"""Sharding rules: parameter PartitionSpecs + batch sharding.

Replaces the reference's implicit DDP replication (reference
configs/trainer/ddp.yaml) with explicit jax.sharding annotations:

  * every parameter replicated by default (DP);
  * MoE expert-bank parameters (leading K axis — see
    medmoe_tpu/models/moe.py ExpertBank) sharded over the ``expert`` axis
    when EP is enabled;
  * batches sharded over ``data`` on their leading axis.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameter path fragments that carry a leading expert axis
_EXPERT_PARAM_KEYS = ("proj_w", "proj_b", "attn_w1", "attn_b1", "attn_w2",
                      "attn_b2")


def _is_expert_param(path: tuple) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    return any("experts" == k for k in keys) and any(
        str(keys[-1]).startswith(frag) for frag in _EXPERT_PARAM_KEYS)


def param_shardings(params: Any, mesh: Mesh, expert_parallel: bool = False):
    """PyTree of NamedShardings for a parameter tree."""

    def spec_for(path, leaf):
        if expert_parallel and _is_expert_param(path):
            return NamedSharding(mesh, P("expert", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for every array in a batch."""
    return NamedSharding(mesh, P("data"))


def _place_process_local(batch: Any, sharding: NamedSharding) -> Any:
    """Assemble global arrays from per-process rows; leaves that are
    already (global) jax.Arrays pass through untouched."""
    import numpy as np

    def place(x):
        if isinstance(x, jax.Array):
            return x
        return jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(x))

    return jax.tree_util.tree_map(place, batch)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh, sharded over ``data``.

    Single-process: one device_put. Multi-process (pod): each process's
    loader yields only ITS rows of the global batch (data/shards.py splits
    by jax.process_index), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — each process transfers
    its addressable shards only; no host ever holds the global batch."""
    if jax.process_count() > 1:
        return _place_process_local(batch, batch_sharding(mesh))
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_stacked_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a stacked accumulation window ([accum, micro, ...], micro axis
    sharded over ``data``) for multi-process runs. Single-process returns
    the batch untouched: the jitted step's in_shardings place host numpy in
    one transfer there (the measured-faster form, train/loop.py), whereas
    committed per-process numpy under a multi-host mesh is either rejected
    by jit or silently treated as the GLOBAL batch."""
    if jax.process_count() <= 1:
        return batch
    return _place_process_local(
        batch, NamedSharding(mesh, P(None, "data")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
