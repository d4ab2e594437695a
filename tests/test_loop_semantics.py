"""Trainer loop semantics: fractional batch limits (Lightning
dataset-fraction behavior), frozen soft-label tool BERT, scheduler
checkpoint state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_batch, tiny_loss, tiny_text, tiny_vision


class TestLimit:
    def _items(self, n=10):
        return list(range(n))

    def test_int_limit_caps(self):
        from medmoe_tpu.train.loop import _limit

        assert list(_limit(self._items(), 3, None)) == [0, 1, 2]

    def test_none_passthrough(self):
        from medmoe_tpu.train.loop import _limit

        assert list(_limit(self._items(), None, None)) == self._items()

    def test_fraction_of_known_length(self):
        from medmoe_tpu.train.loop import _limit

        # Lightning semantics: fraction of the dataloader, at least 1 batch
        assert list(_limit(self._items(), 0.5, 10)) == [0, 1, 2, 3, 4]
        assert list(_limit(self._items(), 0.01, 10)) == [0]

    def test_float_one_means_all(self):
        from medmoe_tpu.train.loop import _limit

        assert list(_limit(self._items(), 1.0, None)) == self._items()

    def test_fraction_without_length_errors(self):
        from medmoe_tpu.train.loop import _limit

        with pytest.raises(ValueError, match="dataset fraction"):
            list(_limit(self._items(), 0.05, None, "val"))


@pytest.mark.slow
class TestToolBert:
    def _module(self):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.train.module import MedMoEPretrainingModule

        return MedMoEPretrainingModule(
            model=DotDict(dict(vision=tiny_vision(),
                               text=tiny_text(freeze_bert=False))),
            loss=tiny_loss(soft_label=True))

    def test_soft_targets_use_frozen_snapshot(self):
        mod = self._module()
        assert mod.uses_tool_bert
        batch, _ = tiny_batch()
        params = mod.init_params(jax.random.PRNGKey(0), batch)
        mod.capture_tool_params(params)
        assert mod.tool_bert_params is not None

        scores0, _ = mod._soft_targets(params, batch, mod.tool_bert_params)
        # simulate training updating BERT
        perturbed = jax.tree_util.tree_map(lambda x: x + 0.5, params)
        scores_tool, _ = mod._soft_targets(perturbed, batch,
                                           mod.tool_bert_params)
        np.testing.assert_allclose(np.asarray(scores0),
                                   np.asarray(scores_tool), atol=1e-6)
        # without the tool snapshot the targets would drift
        scores_live, _ = mod._soft_targets(perturbed, batch, None)
        assert not np.allclose(np.asarray(scores0), np.asarray(scores_live),
                               atol=1e-3)

    def test_soft_targets_respect_position_table_size(self):
        """_soft_targets must rebuild the tool BERT with the SAME config as
        the live tower (BertConfig.from_cfg); a non-default
        max_position_embeddings previously crashed with a param-shape
        mismatch because the rebuilt config silently used the 512 default."""
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.train.module import MedMoEPretrainingModule

        mod = MedMoEPretrainingModule(
            model=DotDict(dict(
                vision=tiny_vision(),
                text=tiny_text(freeze_bert=False,
                               max_position_embeddings=12))),
            loss=tiny_loss(soft_label=True))
        batch, _ = tiny_batch()
        params = mod.init_params(jax.random.PRNGKey(0), batch)
        mod.capture_tool_params(params)
        scores, thr = mod._soft_targets(params, batch, mod.tool_bert_params)
        assert np.all(np.isfinite(np.asarray(scores)))
        assert scores.shape[0] == scores.shape[1] == batch["image"].shape[0]

    def test_train_step_runs_with_tool(self):
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.train.step import build_train_step

        mod = self._module()
        batch, _ = tiny_batch()
        params = mod.init_params(jax.random.PRNGKey(0), batch)
        mod.capture_tool_params(params)
        state = TrainState.create(params, mod.make_optimizer())
        step = build_train_step(mod)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # snapshot itself must be untouched by the update
        tool_after = mod.tool_bert_params
        leaves_before = jax.tree_util.tree_leaves(tool_after)
        assert all(np.all(np.isfinite(np.asarray(x)))
                   for x in leaves_before)


class TestSchedulerCheckpointState:
    def test_state_round_trip(self):
        from medmoe_tpu.train.optim import reduce_lr_on_plateau

        sched = reduce_lr_on_plateau(patience=2)
        lr = 1e-3
        for v in [1.0, 1.1, 1.2]:          # 2 bad epochs after the best
            lr = sched.step(v, lr)
        saved = sched.state_dict()

        resumed = reduce_lr_on_plateau(patience=2)
        resumed.load_state_dict(saved)
        # one more bad epoch trips the patience on BOTH trajectories
        lr_cont = sched.step(1.3, 1e-3)
        lr_res = resumed.step(1.3, 1e-3)
        assert lr_cont == lr_res == pytest.approx(1e-4)

    def test_trainer_checkpoint_extra(self):
        from medmoe_tpu.train.loop import Trainer
        from medmoe_tpu.train.optim import reduce_lr_on_plateau

        t = Trainer(accelerator="cpu", devices=1)
        assert t.checkpoint_extra() == {}
        t.scheduler = reduce_lr_on_plateau()
        t.scheduler.step(0.5, 1e-3)
        extra = t.checkpoint_extra()
        assert extra["scheduler"]["best"] == 0.5

    def test_global_negatives_flag_sets_full_batch(self):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.train.module import MedMoEPretrainingModule

        mod = MedMoEPretrainingModule(
            model=DotDict(dict(vision=tiny_vision(), text=tiny_text())),
            loss=tiny_loss(global_negatives=True, block_size=4))
        assert mod.block_size is None      # full-global-batch negatives
        mod2 = MedMoEPretrainingModule(
            model=DotDict(dict(vision=tiny_vision(), text=tiny_text())),
            loss=tiny_loss(global_negatives=False, block_size=4))
        assert mod2.block_size == 4

    @pytest.mark.slow       # ~4.5 min on the 1-core CPU host (B=256 fwd ×2)
    def test_blocked_loss_is_mean_of_independent_block_losses(self):
        """The DDP-parity regime (experiment=pretraining_medmoe_ddp):
        one B=256 step with block_size=32 must produce EXACTLY the mean of
        eight independent B=32 losses — the reference's 8-rank DDP math
        (reference src/data/unimed_datamodule.py:74-79 per-rank batch,
        src/losses.py:503-524 per-rank BxB contrastive blocks; the DDP grad
        allreduce averages the per-rank losses)."""
        import jax
        import numpy as np

        from tests.helpers import tiny_batch, tiny_module

        b, bs = 256, 32
        mod = tiny_module(global_negatives=False, block_size=bs)
        batch, _ = tiny_batch(batch_size=b)
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        loss_full, _ = jax.jit(mod.loss_fn)(params, batch)

        per_block = []
        for i in range(b // bs):
            sl = {k: v[i * bs:(i + 1) * bs] for k, v in batch.items()}
            l, _ = jax.jit(mod.loss_fn)(params, sl)
            per_block.append(float(l))
        assert np.isclose(float(loss_full), np.mean(per_block), rtol=2e-5), \
            (float(loss_full), np.mean(per_block))

    def test_accum_scan_equals_monolithic_blocked_step(self):
        """The bench's DDP-parity leg executes the global-batch step as a
        lax.scan over micro-batches (accum-mean grads) instead of one
        monolithic batch with block_size losses. Both are the reference's
        8-rank DDP math; this pins that they take the SAME optimizer step:
        per-micro BxB losses == per-rank losses and accum-mean ==
        allreduce-mean (measured 550.6 vs 391.9 pairs/s on v5e at B=256 —
        the monolithic form's 14.4 GB temp spills at the HBM ceiling)."""
        import jax
        import numpy as np

        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.train.step import build_train_step
        from tests.helpers import tiny_batch, tiny_module

        b, bs = 8, 4
        mod = tiny_module(global_negatives=False, block_size=bs)
        batch, _ = tiny_batch(batch_size=b)
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        tx = mod.make_optimizer(gradient_clip_val=0.25)

        mono = build_train_step(mod, mesh=None, accum_steps=1, donate=False)
        s1, m1 = mono(TrainState.create(params, tx), batch,
                      jax.random.PRNGKey(1))

        stacked = jax.tree_util.tree_map(
            lambda x: np.asarray(x).reshape((b // bs, bs) + x.shape[1:]),
            batch)
        scan = build_train_step(mod, mesh=None, accum_steps=b // bs,
                                donate=False)
        s2, m2 = scan(TrainState.create(params, tx), stacked,
                      jax.random.PRNGKey(1))

        # compare loss components and the grad global norm: post-Adam params
        # are ill-conditioned for this check (roundoff-level grad diffs on
        # zero-init biases flip the sign of a full lr-sized Adam update)
        for key in ("loss", "l_loss", "g_loss", "c_loss"):
            np.testing.assert_allclose(float(m1[key]), float(m2[key]),
                                       rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(float(m1["grad_norm"]),
                                   float(m2["grad_norm"]), rtol=1e-4)
        del s1, s2


class TestFrozenParamMasking:
    """Frozen subtrees (freeze_bert/freeze_cnn/freeze_encoder) are masked
    out of the optimizer (optax.masked): no Adam moments, no weight decay,
    bitwise-unchanged params — matching torch Adam, which skips
    requires_grad=False params entirely."""

    def _module(self, **loss_kw):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.train.module import MedMoEPretrainingModule

        return MedMoEPretrainingModule(
            model=DotDict(dict(vision=tiny_vision(),
                               text=tiny_text(freeze_bert=True))),
            loss=tiny_loss(**loss_kw))

    def test_frozen_bert_has_no_adam_state(self):
        import optax

        from medmoe_tpu.train.state import TrainState

        mod = self._module()
        batch, _ = tiny_batch()
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        state = TrainState.create(params, mod.make_optimizer())
        assert isinstance(state.opt_state, optax.MaskedState)
        moment_leaves = [
            x for x in jax.tree_util.tree_leaves(state.opt_state)
            if hasattr(x, "shape")]
        n_moments = sum(x.size for x in moment_leaves if x.ndim > 0)
        n_frozen = sum(
            x.size for x in jax.tree_util.tree_leaves(
                params["text_encoder"]["bert"]))
        n_all = sum(x.size for x in jax.tree_util.tree_leaves(params))
        # Adam keeps mu+nu for trainable params only
        assert n_moments == 2 * (n_all - n_frozen)

    def test_frozen_bert_params_bitwise_unchanged(self):
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.train.step import build_train_step

        mod = self._module()
        batch, _ = tiny_batch()
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        state = TrainState.create(params, mod.make_optimizer(
            gradient_clip_val=0.25))
        step = build_train_step(mod, mesh=None, donate=False)
        before = jax.tree_util.tree_map(np.asarray,
                                        params["text_encoder"]["bert"])
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))
        after = state.params["text_encoder"]["bert"]
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(before),
                jax.tree_util.tree_leaves_with_path(after)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), ka
        # ...and the trainable towers actually moved
        img_before = mod.init_params(jax.random.PRNGKey(0), batch)
        assert not all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(img_before["image_encoder"]),
                jax.tree_util.tree_leaves(state.params["image_encoder"])))

    def test_weight_decay_skips_frozen_params(self):
        """Latent-bug regression: unmasked add_decayed_weights used to decay
        the frozen BERT (torch Adam never visits grad-less params)."""
        import functools

        from medmoe_tpu.train.optim import adam
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.train.step import build_train_step

        mod = self._module()
        mod.optimizer_factory = functools.partial(adam, lr=1e-2,
                                                  weight_decay=0.1)
        batch, _ = tiny_batch()
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        state = TrainState.create(params, mod.make_optimizer())
        step = build_train_step(mod, mesh=None, donate=False)
        before = jax.tree_util.tree_map(np.asarray,
                                        params["text_encoder"]["bert"])
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        for a, b in zip(
                jax.tree_util.tree_leaves(before),
                jax.tree_util.tree_leaves(
                    state.params["text_encoder"]["bert"])):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_lr_helpers_unwrap_masked_state(self):
        from medmoe_tpu.train.optim import (get_learning_rate,
                                            set_learning_rate)
        from medmoe_tpu.train.state import TrainState

        mod = self._module()
        batch, _ = tiny_batch()
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        state = TrainState.create(params, mod.make_optimizer())
        assert get_learning_rate(state.opt_state) == pytest.approx(5e-5)
        new = set_learning_rate(state.opt_state, 5e-6)
        assert get_learning_rate(new) == pytest.approx(5e-6)

    def test_legacy_unmasked_checkpoint_restores_params(self, tmp_path):
        """A checkpoint saved BEFORE frozen-subtree masking (full Adam
        moments for every param) still restores: params+step come back
        exactly, optimizer moments start fresh (documented fallback in
        restore_checkpoint)."""
        from medmoe_tpu.train.optim import adam
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.utils.checkpoint import (restore_checkpoint,
                                                 save_checkpoint)

        mod = self._module()
        batch, _ = tiny_batch()
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        # legacy state: unmasked optimizer (pre-masking structure)
        legacy = TrainState.create(params, adam(lr=5e-5))
        legacy = legacy.replace(step=jnp.asarray(7, legacy.step.dtype)) \
            if hasattr(legacy.step, "dtype") else legacy.replace(step=7)
        save_checkpoint(str(tmp_path / "ckpt"), legacy)

        # live state: masked optimizer (current structure)
        fresh = TrainState.create(
            jax.tree_util.tree_map(jnp.zeros_like, params),
            mod.make_optimizer())
        restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
        assert int(restored.step) == 7
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_classification_probe_masks_encoder(self):
        import optax

        from medmoe_tpu.train.classification import ClassificationModule
        from medmoe_tpu.train.state import TrainState

        mod = ClassificationModule(vision=tiny_vision(), num_classes=3,
                                   freeze_encoder=True)
        batch, _ = tiny_batch()
        batch = dict(batch, label=np.arange(batch["image"].shape[0]) % 3)
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        state = TrainState.create(params, mod.make_optimizer())
        assert isinstance(state.opt_state, optax.MaskedState)
        moment_leaves = [
            x for x in jax.tree_util.tree_leaves(state.opt_state)
            if hasattr(x, "shape") and x.ndim > 0]
        n_head = sum(x.size for x in jax.tree_util.tree_leaves(
            params["head"]))
        assert sum(x.size for x in moment_leaves) == 2 * n_head
