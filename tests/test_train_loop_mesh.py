"""Multi-device Trainer.fit end to end on the simulated 8-device mesh
(VERDICT round-3 directive #2).

Step-level EP/DP equivalence lives in test_parallel.py; every other Trainer
e2e test pins devices=1. These run the WHOLE reference `trainer=ddp`
surface (reference configs/trainer/ddp.yaml:1-9) above the step: epoch
loop, validation, ModelCheckpoint writing SHARDED orbax state, preempt-free
resume with matching LR/metric trajectory, and a topology-change restore
(checkpoint saved from a single-device run restored onto the 8-device
mesh — the orbax "different topology" edge asserted safe).
"""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

# tiny towers; expert axis 2 needs num_experts % 2 == 0, data axis needs
# batch_size % data == 0 (ep mesh: 4 data × 2 expert; ddp mesh: 8 data)
MESH_TINY = [
    "data=synthetic",
    "data.batch_size=8",
    "data.num_samples=32",
    "data.image_size=56",
    "data.num_classes=4",
    "model.model.vision.image_size=56",
    "model.model.vision.swin_embed_dim=8",
    "model.model.vision.swin_depths=[1,1]",
    "model.model.vision.swin_num_heads=[1,2]",
    "model.model.vision.num_experts=4",
    "model.model.vision.embed_dim=16",
    "model.model.vision.dtype=float32",
    "model.model.vision.drop_path_rate=0.0",
    "model.model.text.hidden_size=16",
    "model.model.text.num_layers=2",
    "model.model.text.num_heads=2",
    "model.model.text.intermediate_size=32",
    "model.model.text.vocab_size=64",
    "model.model.text.embed_dim=16",
    "model.model.text.max_length=10",
    "model.model.text.dtype=float32",
    "model.model.text.hidden_dropout_prob=0.0",
    "model.model.text.attention_probs_dropout_prob=0.0",
    "trainer.devices=8",
    "trainer.num_sanity_val_steps=1",
    "trainer.log_every_n_steps=1",
    "trainer.accumulate_grad_batches=2",   # stacked-accum path on the mesh
    "trainer.limit_val_batches=2",
    "~callbacks.early_stopping",
]


def _fit(tmp_path, experiment, extra):
    from medmoe_tpu.cli.train import train
    from medmoe_tpu.config import compose

    cfg = compose("train", [f"experiment={experiment}"] + MESH_TINY
                  + [f"paths.root_dir={tmp_path}"] + extra)
    _, objs = train(cfg)
    return objs["trainer"]


def _ckpt_dir(tmp_path):
    return os.path.join(str(tmp_path), "logs", "train", "runs",
                        "checkpoints")


_COMPARE_KEYS = ("train/loss", "train/g_loss", "train/l_loss",
                 "train/c_loss", "val/loss")


class TestEpFit:
    def test_ep_fit_validates_checkpoints_and_resumes_identically(
            self, tmp_path):
        """experiment=ep_full_mix (mesh 4 data × 2 expert, moe_mode=ep)
        through Trainer.fit: 3-epoch uninterrupted run vs 1-epoch run +
        resume — metric trajectory and final params must match."""
        # uninterrupted 3 epochs
        t_full = _fit(tmp_path / "full", "ep_full_mix",
                      ["trainer.max_epochs=3"])
        assert len(t_full.metrics_history) == 3
        for epoch_metrics in t_full.metrics_history:
            assert np.isfinite(epoch_metrics["train/loss"])
            assert np.isfinite(epoch_metrics["val/loss"])   # validation ran

        # expert-sharded params really are sharded over the mesh
        from jax.sharding import PartitionSpec

        expert_sharded = [
            leaf for leaf in jax.tree_util.tree_leaves(t_full.state.params)
            if getattr(leaf, "sharding", None) is not None
            and "expert" in (leaf.sharding.spec or PartitionSpec())]
        assert expert_sharded, "no parameter carries an 'expert' axis spec"

        # ModelCheckpoint wrote sharded orbax state
        ckpts = _ckpt_dir(tmp_path / "full")
        assert os.path.isdir(ckpts)
        entries = os.listdir(ckpts)
        assert "last" in entries
        assert any(e.startswith("epoch_") for e in entries)

        # interrupted: 1 epoch, then resume for 2 more from 'last'
        t_a = _fit(tmp_path / "resume", "ep_full_mix",
                   ["trainer.max_epochs=1"])
        assert len(t_a.metrics_history) == 1
        last = os.path.join(_ckpt_dir(tmp_path / "resume"), "last")
        t_b = _fit(tmp_path / "resume", "ep_full_mix",
                   ["trainer.max_epochs=3", f"ckpt_path={last}"])
        resumed_history = t_a.metrics_history + t_b.metrics_history
        assert len(resumed_history) == 3

        for ep, (full_m, res_m) in enumerate(zip(t_full.metrics_history,
                                                 resumed_history)):
            for k in _COMPARE_KEYS:
                np.testing.assert_allclose(
                    res_m[k], full_m[k], rtol=1e-4, atol=1e-6,
                    err_msg=f"epoch {ep} metric {k} diverged after resume")
        for a, b in zip(jax.tree_util.tree_leaves(t_full.state.params),
                        jax.tree_util.tree_leaves(t_b.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestDdpFit:
    def test_ddp_fit_two_epochs(self, tmp_path):
        """Reference-compat trainer=ddp (mesh 8 data × 1 expert) through
        Trainer.fit with validation and checkpointing."""
        t = _fit(tmp_path, "pretraining_medmoe",
                 ["trainer=ddp", "trainer.devices=8",
                  "trainer.max_epochs=2", "trainer.gradient_clip_val=0.25"])
        assert len(t.metrics_history) == 2
        for m in t.metrics_history:
            assert np.isfinite(m["train/loss"]) and np.isfinite(m["val/loss"])
        assert os.path.exists(os.path.join(_ckpt_dir(tmp_path), "last"))
        # data-parallel params are replicated (no named axis in any spec)
        from jax.sharding import PartitionSpec

        for leaf in jax.tree_util.tree_leaves(t.state.params):
            spec = getattr(leaf.sharding, "spec", PartitionSpec())
            assert all(axis is None for axis in spec), spec


class TestTopologyChange:
    def test_single_device_checkpoint_restores_onto_8_device_mesh(
            self, tmp_path):
        """Save from a devices=1 run, restore into EP-sharded 8-device
        state: orbax warns 'unsafe when restoring on a different topology';
        this pins that the restored values AND target shardings are
        correct anyway (single-process resharding on restore)."""
        t1 = _fit(tmp_path, "ep_full_mix",
                  ["trainer.devices=1", "trainer.mesh.data=1",
                   "trainer.mesh.expert=1", "trainer.max_epochs=1"])
        last = os.path.join(_ckpt_dir(tmp_path), "last")
        assert os.path.exists(last)
        saved_params = jax.device_get(t1.state.params)

        from medmoe_tpu.parallel.mesh import make_mesh
        from medmoe_tpu.parallel.sharding import param_shardings
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.utils.checkpoint import restore_checkpoint

        mesh = make_mesh(data=4, expert=2)
        tx = t1.module.make_optimizer(gradient_clip_val=0.25)
        shardings = param_shardings(saved_params, mesh, expert_parallel=True)
        zeros = jax.tree_util.tree_map(
            lambda p, s: jax.device_put(np.zeros_like(p), s),
            saved_params, shardings)
        state = TrainState.create(zeros, tx)

        restored = restore_checkpoint(last, state)
        assert int(restored.step) == int(t1.state.step)
        for a, b, s in zip(jax.tree_util.tree_leaves(saved_params),
                           jax.tree_util.tree_leaves(restored.params),
                           jax.tree_util.tree_leaves(shardings)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=0)
            assert b.sharding.is_equivalent_to(s, b.ndim), (b.sharding, s)

        # and the restored sharded state takes a finite EP train step
        from medmoe_tpu.train.step import build_train_step

        step = build_train_step(t1.module, mesh=mesh, accum_steps=1,
                                donate=False)
        batch, _ = _tiny_mesh_batch()
        new_state, metrics = step(restored, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


def _tiny_mesh_batch():
    from tests.helpers import tiny_batch

    return tiny_batch(batch_size=8)


class TestSoftLabelFit:
    def test_soft_label_tool_params_ride_the_mesh(self, tmp_path):
        """soft_label=true with a TRAINING bert (freeze_bert=false) feeds a
        FROZEN tool-BERT tree into the jitted step next to mesh-sharded
        state. The tool tree must be replicated over the SAME mesh — a
        committed single-device copy is a jit 'incompatible devices' error
        on any devices>1 run (round-4 review finding; no other mesh test
        exercises soft_label)."""
        t = _fit(tmp_path, "pretraining_medmoe",
                 ["trainer=ddp", "trainer.devices=8", "trainer.max_epochs=1",
                  "model.loss.soft_label=true",
                  "model.model.text.freeze_bert=false"])
        assert len(t.metrics_history) == 1
        assert np.isfinite(t.metrics_history[0]["train/loss"])
        assert np.isfinite(t.metrics_history[0]["val/loss"])
        tool = t.module.tool_bert_params
        assert tool is not None, "tool-BERT snapshot was not captured"
        leaf = jax.tree_util.tree_leaves(tool)[0]
        assert isinstance(leaf.sharding, jax.sharding.NamedSharding)
        assert leaf.sharding.mesh.devices.size == 8


class TestGloria256Fit:
    def test_gloria256_composes_and_fits_at_batch_256(self, tmp_path):
        """experiment=gloria256 (VERDICT round-4 directive #4): monolithic
        B=256 with FULL global negatives — the regime where the GLoRIA
        Pallas kernels auto-select on TPU — composes and runs Trainer.fit
        end to end on the 8-device mesh at that batch."""
        t = _fit(tmp_path, "gloria256",
                 ["trainer=ddp", "trainer.devices=8", "trainer.max_epochs=1",
                  "data.batch_size=256", "data.num_samples=512",
                  "trainer.accumulate_grad_batches=1",
                  "trainer.num_sanity_val_steps=0",
                  "trainer.limit_val_batches=1"])
        assert len(t.metrics_history) == 1
        assert np.isfinite(t.metrics_history[0]["train/loss"])
        # full-batch negatives: global_negatives=true collapsed block_size
        assert t.module.block_size is None
        # ...and at this per-device batch the auto-select picks the Pallas
        # kernel on TPU (CPU tests take the XLA path; the TPU decision is
        # the pure function below — benched in BENCH legs gloria256_*)
        assert t.module.local_loss._resolve_impl("sum", 256) in (
            "pallas", "xla")
        import unittest.mock as mock

        fake_tpu = mock.MagicMock()
        fake_tpu.platform = "tpu"
        with mock.patch("jax.devices", return_value=[fake_tpu]):
            assert t.module.local_loss._resolve_impl("sum", 256) == "pallas"
