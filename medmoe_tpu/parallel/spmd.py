"""Trace-time SPMD context for kernel-level sharding decisions.

GSPMD partitions ordinary XLA ops automatically, but a ``pallas_call`` is a
custom call it cannot see into: under a multi-device mesh it would all-gather
the operands and run the kernel replicated on every device. The train/eval
step builders (medmoe_tpu/train/step.py) enter this context while tracing,
and the Pallas wrappers (ops/pallas/*) consult it to wrap themselves in
``jax.shard_map`` over the data axis — per-shard kernels, differentiable,
with the replicated-parameter cotangent psum handled by shard_map's
transpose.

This replaces what the reference gets implicitly from DDP: every rank runs
its own kernel on its own batch shard (reference src/utils/distributed.py +
Lightning DDP).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import NamedTuple, Optional

from jax.sharding import Mesh


class SpmdContext(NamedTuple):
    mesh: Mesh
    data_axis: str


_CTX: contextvars.ContextVar[Optional[SpmdContext]] = \
    contextvars.ContextVar("medmoe_spmd_ctx", default=None)


@contextlib.contextmanager
def spmd_context(mesh: Optional[Mesh], data_axis: str = "data"):
    """Declare the ambient mesh while tracing a step function."""
    if mesh is None or data_axis not in mesh.shape:
        yield
        return
    token = _CTX.set(SpmdContext(mesh, data_axis))
    try:
        yield
    finally:
        _CTX.reset(token)


def current_spmd() -> Optional[SpmdContext]:
    """The ambient (mesh, data_axis), or None outside a step trace. Returns
    None as well when the data axis is trivial (1 device) — shard_map would
    only add noise there."""
    ctx = _CTX.get()
    if ctx is None or ctx.mesh.shape[ctx.data_axis] <= 1:
        return None
    return ctx
