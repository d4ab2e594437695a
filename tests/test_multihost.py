"""Multi-host bootstrap (parallel/multihost.py) and process-local batch
placement (parallel/sharding.shard_batch). Real multi-process runs need a
pod; these pin the gating logic and the single-process equivalence of the
make_array_from_process_local_data path."""

import jax
import numpy as np
import pytest

from medmoe_tpu.parallel import multihost


class TestMaybeInitialize:
    def test_single_host_noop(self, monkeypatch):
        for v in multihost._CLUSTER_ENV_VARS + ("MEDMOE_MULTIHOST",):
            monkeypatch.delenv(v, raising=False)

        def boom():
            raise AssertionError("initialize must not be called")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
        assert multihost.maybe_initialize() is False
        assert multihost.maybe_initialize(num_nodes=1) is False
        assert multihost.maybe_initialize(num_nodes=0) is False

    def test_already_initialized_short_circuits(self, monkeypatch):
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)

        def boom():
            raise AssertionError("initialize must not be re-called")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        assert multihost.maybe_initialize(num_nodes=4) is True

    def test_num_nodes_without_cluster_raises(self, monkeypatch):
        for v in multihost._CLUSTER_ENV_VARS + ("MEDMOE_MULTIHOST",):
            monkeypatch.delenv(v, raising=False)
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda: (_ for _ in ()).throw(RuntimeError("no coordinator")))
        with pytest.raises(RuntimeError, match="num_nodes=4"):
            multihost.maybe_initialize(num_nodes=4)

    def test_env_marker_triggers_initialize(self, monkeypatch):
        monkeypatch.setenv("MEDMOE_MULTIHOST", "1")
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
        called = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda: called.append(True))
        assert multihost.maybe_initialize() is True
        assert called == [True]

    def test_detected_env_failure_degrades_gracefully(self, monkeypatch):
        # cluster markers present but initialize fails and num_nodes<=1:
        # warn + continue single-process, never crash
        monkeypatch.setenv("MEDMOE_MULTIHOST", "1")
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda: (_ for _ in ()).throw(RuntimeError("no coordinator")))
        assert multihost.maybe_initialize(num_nodes=1) is False

    def test_trainer_surface(self):
        """trainer.num_nodes composes (reference ddp.yaml:7) and a
        num_nodes=1 Trainer constructs without touching jax.distributed."""
        from medmoe_tpu.config import compose
        from medmoe_tpu.utils import instantiate

        cfg = compose("train", ["experiment=pretraining_medmoe",
                                "trainer.accelerator=cpu",
                                "trainer.devices=1"])
        assert int(cfg.trainer.num_nodes) == 1
        trainer = instantiate(cfg.trainer)
        assert trainer.num_nodes == 1


class TestShardBatchProcessLocal:
    def test_make_array_path_matches_device_put(self, monkeypatch):
        """In single-process the make_array_from_process_local_data path
        must produce the same global array device_put does (all devices
        are local, so the 'process-local rows' are the whole batch)."""
        from medmoe_tpu.parallel.mesh import make_mesh
        from medmoe_tpu.parallel.sharding import shard_batch

        mesh = make_mesh(data=-1, expert=1)
        n = mesh.devices.size
        batch = {"x": np.arange(4 * n * 3, dtype=np.float32)
                 .reshape(4 * n, 3)}
        expected = shard_batch(batch, mesh)          # device_put path
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        got = shard_batch(batch, mesh)               # make_array path
        assert got["x"].sharding == expected["x"].sharding
        np.testing.assert_array_equal(np.asarray(got["x"]),
                                      np.asarray(expected["x"]))

    def test_stacked_window_placement(self, monkeypatch):
        """The accumulation window ([accum, micro, ...]) must go through
        make_array_from_process_local_data on multi-process runs with the
        micro axis on 'data' — committed per-process numpy under a global
        mesh is either rejected by jit or silently treated as the global
        batch. Single-process: passthrough (jit places host numpy itself,
        the measured-faster form). Already-global jax.Arrays (the overfit
        device cache) pass through untouched in both modes."""
        from jax.sharding import PartitionSpec as P

        from medmoe_tpu.parallel.mesh import make_mesh
        from medmoe_tpu.parallel.sharding import shard_stacked_batch

        mesh = make_mesh(data=-1, expert=1)
        n = mesh.devices.size
        window = {"x": np.arange(2 * 4 * n, dtype=np.float32)
                  .reshape(2, 4 * n)}
        same = shard_stacked_batch(window, mesh)
        assert same["x"] is window["x"]              # single-process: no-op

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        placed = shard_stacked_batch(window, mesh)
        assert isinstance(placed["x"], jax.Array)
        assert placed["x"].sharding.spec == P(None, "data")
        np.testing.assert_array_equal(np.asarray(placed["x"]), window["x"])
        again = shard_stacked_batch(placed, mesh)    # device leaves pass
        assert again["x"] is placed["x"]

    def test_int_devices_selects_per_process(self):
        """trainer.devices=N must take N LOCAL devices from each process,
        not a prefix of the global list (which would give later hosts a
        mesh with zero addressable devices)."""
        from medmoe_tpu.train.loop import _select_local_devices

        class FakeDev:
            def __init__(self, pid, i):
                self.process_index = pid
                self.id = i

        devs = [FakeDev(p, i) for p in range(2) for i in range(4)]
        picked = _select_local_devices(devs, 2)
        assert [(d.process_index, d.id) for d in picked] == [
            (0, 0), (0, 1), (1, 0), (1, 1)]
        # single-process: same as the old prefix slice
        solo = [FakeDev(0, i) for i in range(8)]
        assert _select_local_devices(solo, 3) == solo[:3]
