"""Multi-host (multi-process) bootstrap.

The reference trains multi-node through Lightning's DDP launcher
(reference configs/trainer/ddp.yaml ``num_nodes`` + the submitit sweep
launcher). On TPU pods the equivalent is one Python process per host, all
joined into a single JAX runtime by ``jax.distributed.initialize()`` —
after which ``jax.devices()`` spans the whole pod, the ``data``/``expert``
mesh axes cover every chip, and the gradient psum / all-gather collectives
ride ICI with zero further code. The framework pieces that must be
process-aware already are:

  * shard splitting: ``data/shards.py`` keys on jax.process_index;
  * batch placement: ``parallel/sharding.shard_batch`` assembles the
    global batch from per-process rows via
    ``jax.make_array_from_process_local_data`` when process_count > 1;
  * logging/checkpoint: RankedLogger gates on process 0; orbax is
    multihost-aware once jax.distributed is initialized.

``maybe_initialize`` is the single idempotent entry point the CLIs call
BEFORE first device use (jax.distributed.initialize must precede backend
initialization).
"""

from __future__ import annotations

import os
from typing import Optional

from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)

# environment markers that indicate a managed multi-process launch;
# jax.distributed.initialize() auto-detects the cluster from any of them.
# Address-style vars mark a cluster whenever SET; count-style vars only
# when their value says more than one task (a single-node Slurm job sets
# SLURM_JOB_NUM_NODES=1 — not a cluster).
_ADDRESS_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",      # explicit JAX cluster spec
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # multislice
)
_COUNT_ENV_VARS = (
    "SLURM_JOB_NUM_NODES",          # Slurm (the reference's launcher)
    "OMPI_COMM_WORLD_SIZE",         # OpenMPI
)


def _cluster_env_detected() -> bool:
    if os.environ.get("MEDMOE_MULTIHOST") == "1":
        return True
    if any(os.environ.get(v, "1") not in ("", "1") for v in _COUNT_ENV_VARS):
        return True
    return any(os.environ.get(v) for v in _ADDRESS_ENV_VARS)


def _manual_launch_spec():
    """Explicit per-process cluster spec for MANUAL launches.

    jax.distributed.initialize() reads JAX_COORDINATOR_ADDRESS itself but
    has no env spelling for the process count/id — those normally come
    from a managed launcher (Slurm/OpenMPI/TPU metadata). A hand-rolled
    pod launch (one ssh per host — and the real-2-process CPU test in
    tests/test_multihost_real.py) sets JAX_NUM_PROCESSES / JAX_PROCESS_ID
    instead; returned as explicit initialize() kwargs."""
    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if n and pid is not None and pid != "":
        return {"num_processes": int(n), "process_id": int(pid)}
    return {}


def maybe_initialize(num_nodes: Optional[int] = None) -> bool:
    """Join the multi-host JAX runtime when a cluster launch is detected.

    Idempotent and safe single-host: without a cluster environment (and
    with num_nodes in (None, 0, 1)) it is a no-op. With ``num_nodes > 1``
    the cluster env is REQUIRED — failing to find one raises instead of
    silently training on 1/Nth of the pod. Returns True when
    jax.distributed was initialized (now or previously)."""
    import jax

    if jax.distributed.is_initialized():
        return True  # already joined (e.g. a second CLI call in-process)

    want = bool(num_nodes and int(num_nodes) > 1)
    detected = _cluster_env_detected()
    if not (want or detected):
        return False
    try:
        jax.distributed.initialize(**_manual_launch_spec())
    except Exception as e:
        if want:
            raise RuntimeError(
                f"trainer.num_nodes={num_nodes} requires a multi-host "
                f"launch (set JAX_COORDINATOR_ADDRESS / run under the pod "
                f"launcher); jax.distributed.initialize failed: {e}"
            ) from e
        log.warning(f"cluster env detected but jax.distributed."
                    f"initialize failed ({e}); continuing single-process")
        return False
    log.info(f"multi-host runtime: process {jax.process_index()} of "
             f"{jax.process_count()}, {jax.local_device_count()} local / "
             f"{jax.device_count()} global devices")
    return True
