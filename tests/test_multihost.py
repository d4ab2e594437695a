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
        for v in (multihost._ADDRESS_ENV_VARS + multihost._COUNT_ENV_VARS
                  + ("MEDMOE_MULTIHOST", "JAX_NUM_PROCESSES",
                     "JAX_PROCESS_ID")):
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
        for v in (multihost._ADDRESS_ENV_VARS + multihost._COUNT_ENV_VARS
                  + ("MEDMOE_MULTIHOST", "JAX_NUM_PROCESSES",
                     "JAX_PROCESS_ID")):
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


class TestMapStyleProcessSplit:
    """Map-style datamodules must yield DISJOINT per-process rows under a
    multi-host runtime (the webdataset reader already splits by
    jax.process_index; without _process_split every host would feed the
    same rows and make_array_from_process_local_data would assemble a
    'global' batch of duplicates)."""

    def test_split_disjoint_equal_and_complete(self, monkeypatch):
        from medmoe_tpu.data.datamodules import BaseDataModule

        dm = BaseDataModule(batch_size=4)
        rows = list(range(103))
        parts = []
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        for p in range(4):
            monkeypatch.setattr(jax, "process_index", lambda p=p: p)
            parts.append(dm._process_split(rows))
        # equal counts (uneven tails would desync per-host batch counts)
        assert {len(part) for part in parts} == {100 // 4}
        flat = [r for part in parts for r in part]
        assert len(set(flat)) == len(flat)            # disjoint
        assert set(flat) == set(range(100))           # trimmed tail only
        # single-process: identity
        monkeypatch.setattr(jax, "process_count", lambda: 1)
        assert dm._process_split(rows) is rows

    def test_synthetic_rows_match_single_process(self, monkeypatch):
        """Process p's synthetic stream must be the same SAMPLES (by index)
        a 1-process run produces — index-keyed rng, not stream position."""
        from medmoe_tpu.data.datamodules import SyntheticDataModule

        dm = SyntheticDataModule(num_samples=8, batch_size=2, image_size=8)
        solo = list(dm._iter(seed=3))
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        part = list(dm._iter(seed=3))
        assert len(part) == 4
        for j, (img, cap, cls) in enumerate(part):
            i = 1 + 2 * j                              # stride slice
            np.testing.assert_array_equal(img, solo[i][0])
            assert (cap, cls) == (solo[i][1], solo[i][2])

    def test_csv_train_split_per_process(self, tmp_path, monkeypatch):
        from medmoe_tpu.data.datamodules import CsvDataModule

        csv_path = tmp_path / "d.csv"
        lines = ["filepath,title,cls"]
        lines += [f"img{i}.jpg,caption {i},0" for i in range(10)]
        csv_path.write_text("\n".join(lines) + "\n")
        dm = CsvDataModule(csv_path=str(csv_path), batch_size=1)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        seen = []
        for p in range(2):
            monkeypatch.setattr(jax, "process_index", lambda p=p: p)
            dm.train_dataloader(epoch=0)   # images missing: split happens
            assert dm.steps_per_epoch == 5  # before decode; counts halve
            rows = dm._process_split(
                sorted(dm._rows(), key=lambda r: r["filepath"]))
            seen += [r["filepath"] for r in rows]
        assert len(set(seen)) == 10                    # disjoint cover


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
