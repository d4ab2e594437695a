"""Test configuration: force an 8-device CPU mesh before jax initializes.

This is the TPU-rebuild analogue of the reference's `trainer=ddp_sim`
(2-process CPU DDP, reference configs/trainer/ddp_sim.yaml) — we fake 8
devices on the host platform so every sharding/collective path is exercised
without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from medmoe_tpu.parallel.mesh import make_mesh

    return make_mesh(data=4, expert=2)
