"""Device mesh construction (replaces the reference's DDP world,
reference configs/trainer/ddp.yaml + src/utils/distributed.py).

One mesh, two axes:
  * ``data``   — batch sharding; gradient reduction happens via sharded
                 autodiff (XLA inserts the psum the reference gets from the
                 DDP allreduce).
  * ``expert`` — MoE expert sharding (EP). ``expert=1`` replicates experts,
                 matching the reference's behavior of computing all experts
                 on every rank (reference swin.py:105-108).

Multi-slice (DCN) layouts can prepend an outer axis later; everything below
addresses a single ICI domain.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1          # -1 = fill with remaining devices
    expert: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        expert = self.expert if self.expert > 0 else 1
        data = self.data
        if data <= 0:
            if n_devices % expert != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by expert={expert}")
            data = n_devices // expert
        if data * expert != n_devices:
            raise ValueError(
                f"mesh {data}x{expert} != {n_devices} devices")
        return data, expert


def make_mesh(data: int = -1, expert: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    d, e = MeshSpec(data, expert).resolve(len(devices))
    array = np.asarray(devices).reshape(d, e)
    return Mesh(array, axis_names=("data", "expert"))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, expert=1, devices=jax.devices()[:1])
