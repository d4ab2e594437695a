"""Cross-device gather primitives (reference src/utils/distributed.py).

The reference needs three gather flavors over NCCL (BackpropType enum,
distributed.py:16-58): GLOBAL (gradients flow to all workers via
torch.distributed.nn.functional.all_gather), LOCAL (plain all_gather with
the local shard's gradient spliced back in), NONE (no gradients).

In JAX the same three semantics are one-liners over a named mesh axis —
``lax.all_gather`` is differentiable by construction (GLOBAL), and the other
two are stop_gradient placements around it.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp


class BackpropType(enum.Enum):
    """How gradients flow through a cross-device gather
    (reference distributed.py:16-25)."""

    GLOBAL = "global"     # gradients flow to every participating device
    LOCAL = "local"       # only the local shard's gradient survives
    NONE = "none"         # no gradients

    @classmethod
    def from_str(cls, value: str) -> "BackpropType":
        return cls(value.lower())


def gather_tensor(x: jnp.ndarray, axis_name: Optional[str] = "data",
                  backprop_type: BackpropType = BackpropType.GLOBAL
                  ) -> jnp.ndarray:
    """all_gather over ``axis_name``, concatenated on the leading axis
    (reference gather_tensor, distributed.py:28-58). Outside a mapped
    context (axis_name None) this is the identity, matching the reference's
    not-distributed early return."""
    if axis_name is None:
        return x
    if backprop_type == BackpropType.GLOBAL:
        return jax.lax.all_gather(x, axis_name, tiled=True)
    gathered = jax.lax.all_gather(jax.lax.stop_gradient(x), axis_name,
                                  tiled=True)
    if backprop_type == BackpropType.NONE:
        return gathered
    # LOCAL: splice this shard's differentiable values back in
    idx = jax.lax.axis_index(axis_name)
    local_b = x.shape[0]
    start = idx * local_b
    return jax.lax.dynamic_update_slice_in_dim(gathered, x, start, axis=0)


def concat_gather_all(x: jnp.ndarray, axis_name: Optional[str] = "data",
                      backprop_type: BackpropType = BackpropType.GLOBAL
                      ) -> jnp.ndarray:
    """reference concat_gather_all_gpu (distributed.py:61-83)."""
    return gather_tensor(x, axis_name, backprop_type)


def get_rank(axis_name: Optional[str] = "data") -> jnp.ndarray:
    """reference get_rank (distributed.py:86-89); inside a mapped context."""
    if axis_name is None:
        return jnp.zeros((), jnp.int32)
    return jax.lax.axis_index(axis_name)
