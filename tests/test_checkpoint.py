"""Checkpoint restore fallback semantics (ADVICE round-3 findings).

The params+step-only fallback in ``restore_checkpoint`` must engage ONLY
for the documented legacy case (saved opt_state tree structure differs from
the live optimizer, e.g. a pre-frozen-masking checkpoint) — any other
failure re-raises. Silently downgrading to fresh optimizer moments after a
transient I/O error would leave multi-host processes with divergent
opt_states (reference analogue: Lightning refuses mismatched checkpoints
outright; we accept exactly the one structure migration we document).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medmoe_tpu.train.state import TrainState
from medmoe_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def _params(shape_a=(3, 2)):
    return {"enc": {"w": jnp.arange(np.prod(shape_a), dtype=jnp.float32)
                    .reshape(shape_a)},
            "head": {"b": jnp.ones((4,), jnp.float32)}}


def _masked_tx():
    return optax.masked(optax.adam(1e-3),
                        {"enc": {"w": True}, "head": {"b": False}})


class TestRestoreFallback:
    def test_legacy_structure_mismatch_restores_params_and_step(self, tmp_path):
        legacy = TrainState.create(_params(), optax.adam(1e-3))
        legacy = legacy.replace(step=jnp.asarray(11, jnp.int32))
        save_checkpoint(str(tmp_path / "ckpt"), legacy)

        live = TrainState.create(
            jax.tree_util.tree_map(jnp.zeros_like, _params()), _masked_tx())
        restored = restore_checkpoint(str(tmp_path / "ckpt"), live)
        assert int(restored.step) == 11
        np.testing.assert_array_equal(
            np.asarray(restored.params["enc"]["w"]),
            np.asarray(_params()["enc"]["w"]))

    def test_same_structure_failure_reraises(self, tmp_path):
        """A restore failure that is NOT the legacy opt-structure case
        (here: params saved under a different tree layout, optimizer leaf
        count unchanged) must re-raise, not silently downgrade."""
        saved = TrainState.create(
            {"enc": {"w_old_name": jnp.ones((3, 2))},
             "head": {"b": jnp.ones((4,))}},
            optax.masked(optax.adam(1e-3),
                         {"enc": {"w_old_name": True}, "head": {"b": False}}))
        save_checkpoint(str(tmp_path / "ckpt"), saved)

        live = TrainState.create(_params(), _masked_tx())
        with pytest.raises(ValueError):
            restore_checkpoint(str(tmp_path / "ckpt"), live)
        # and the error is the orbax structure error, not a downgraded state:
        # restore_checkpoint returning would have been the bug

    def test_fallback_shape_mismatch_names_the_leaf(self, tmp_path):
        """When the legacy fallback engages but a saved param's SHAPE
        disagrees with the live model, the error names the leaf instead of
        surfacing later as an opaque jit shape error."""
        legacy = TrainState.create(_params(shape_a=(5, 2)), optax.adam(1e-3))
        save_checkpoint(str(tmp_path / "ckpt"), legacy)

        live = TrainState.create(_params(shape_a=(3, 2)), _masked_tx())
        with pytest.raises(ValueError, match=r"enc.*w.*\(5, 2\)"):
            restore_checkpoint(str(tmp_path / "ckpt"), live)

    def test_missing_checkpoint_reraises(self, tmp_path):
        live = TrainState.create(_params(), _masked_tx())
        with pytest.raises(Exception):
            restore_checkpoint(str(tmp_path / "nonexistent"), live)


class TestAsyncSave:
    def test_async_save_restores_identically(self, tmp_path):
        """blocking=False (orbax AsyncCheckpointer) must produce a
        checkpoint byte-equivalent to the blocking path: same restored
        params/opt_state/step; restore on a just-saved path barriers on
        the in-flight write (finalize inside restore_checkpoint)."""
        state = TrainState.create(_params(), _masked_tx())
        state = state.replace(step=jnp.asarray(5, jnp.int32))

        save_checkpoint(str(tmp_path / "sync"), state,
                        extra={"epoch": 2}, blocking=True)
        save_checkpoint(str(tmp_path / "async"), state,
                        extra={"epoch": 2}, blocking=False)
        # NO explicit finalize: restore must do the barrier itself
        fresh = TrainState.create(
            jax.tree_util.tree_map(jnp.zeros_like, _params()), _masked_tx())
        r_sync = restore_checkpoint(str(tmp_path / "sync"), fresh)
        r_async = restore_checkpoint(str(tmp_path / "async"), fresh)
        assert int(r_async.step) == 5
        for a, b in zip(jax.tree_util.tree_leaves(r_sync),
                        jax.tree_util.tree_leaves(r_async)):
            if hasattr(a, "shape"):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        import json
        import os

        assert os.path.exists(str(tmp_path / "async") + ".meta.json")
        with open(str(tmp_path / "async") + ".meta.json") as f:
            assert json.load(f)["epoch"] == 2

    def test_mutating_state_after_async_save_is_safe(self, tmp_path):
        """Orbax's async contract: D2H copies happen before save() returns,
        so the caller may donate/overwrite the live arrays immediately —
        the on-disk values must be the PRE-mutation ones."""
        from medmoe_tpu.utils.checkpoint import finalize_saves

        state = TrainState.create(_params(), _masked_tx())
        before = np.asarray(state.params["enc"]["w"]).copy()
        save_checkpoint(str(tmp_path / "ck"), state, blocking=False)
        # overwrite the live buffers while the write may be in flight
        state = state.replace(params=jax.tree_util.tree_map(
            lambda x: x * 0 - 1, state.params))
        finalize_saves()
        fresh = TrainState.create(
            jax.tree_util.tree_map(jnp.zeros_like, _params()), _masked_tx())
        restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
        np.testing.assert_array_equal(
            np.asarray(restored.params["enc"]["w"]), before)

    def test_back_to_back_async_saves_barrier(self, tmp_path):
        """The second async save must wait for the first (one in-flight
        save at a time); both paths restore correctly."""
        s1 = TrainState.create(_params(), _masked_tx())
        s2 = s1.replace(step=jnp.asarray(9, jnp.int32))
        save_checkpoint(str(tmp_path / "a"), s1, blocking=False)
        save_checkpoint(str(tmp_path / "b"), s2, blocking=False)
        fresh = TrainState.create(
            jax.tree_util.tree_map(jnp.zeros_like, _params()), _masked_tx())
        assert int(restore_checkpoint(str(tmp_path / "a"), fresh).step) == 0
        assert int(restore_checkpoint(str(tmp_path / "b"), fresh).step) == 9


class TestSidecarCommitOrdering:
    def test_async_sidecar_deferred_until_commit(self, tmp_path):
        """The .meta.json sidecar must never exist before its checkpoint's
        async write commits: a crash in the background-write window would
        otherwise leave valid-looking epoch metadata pointing at a
        missing/tmp checkpoint dir. The sidecar appears at the next
        barrier (finalize_saves / next save / restore / atexit)."""
        import json
        import os

        from medmoe_tpu.utils.checkpoint import finalize_saves

        state = TrainState.create(_params(), _masked_tx())
        save_checkpoint(str(tmp_path / "ck"), state, extra={"epoch": 7},
                        blocking=False)
        meta = str(tmp_path / "ck") + ".meta.json"
        assert not os.path.exists(meta)        # data not yet committed
        finalize_saves()
        assert os.path.exists(meta)
        with open(meta) as f:
            assert json.load(f)["epoch"] == 7

    def test_blocking_sidecar_written_after_commit(self, tmp_path):
        import json
        import os

        state = TrainState.create(_params(), _masked_tx())
        save_checkpoint(str(tmp_path / "ck"), state, extra={"epoch": 3},
                        blocking=True)
        meta = str(tmp_path / "ck") + ".meta.json"
        assert os.path.exists(meta)            # blocking: committed inline
        with open(meta) as f:
            assert json.load(f)["epoch"] == 3


class TestTopKPruning:
    def test_outperformed_best_checkpoints_are_deleted(self, tmp_path):
        """Lightning save_top_k=1 semantics: a new best evicts the previous
        best's directory + sidecar instead of accumulating 866 MB dirs."""
        import types

        from medmoe_tpu.train.callbacks import ModelCheckpoint

        state = TrainState.create(_params(), _masked_tx())
        trainer = types.SimpleNamespace(
            state=state, loggers=[], default_root_dir=str(tmp_path))
        cb = ModelCheckpoint(dirpath=str(tmp_path / "ck"), save_top_k=1,
                             save_last=False, async_save=False)
        cb.on_epoch_end(trainer, 0, {"val/loss": 3.0})
        first = cb.best_path
        assert os.path.isdir(first)
        cb.on_epoch_end(trainer, 1, {"val/loss": 2.0})      # improves
        second = cb.best_path
        assert os.path.isdir(second) and second != first
        assert not os.path.exists(first)                    # evicted
        assert not os.path.exists(first + ".meta.json")
        cb.on_epoch_end(trainer, 2, {"val/loss": 2.5})      # worse: no save
        assert cb.best_path == second and os.path.isdir(second)

    def test_top_k_minus_one_keeps_everything(self, tmp_path):
        import types

        from medmoe_tpu.train.callbacks import ModelCheckpoint

        state = TrainState.create(_params(), _masked_tx())
        trainer = types.SimpleNamespace(
            state=state, loggers=[], default_root_dir=str(tmp_path))
        cb = ModelCheckpoint(dirpath=str(tmp_path / "ck"), save_top_k=-1,
                             save_last=False, async_save=False)
        cb.on_epoch_end(trainer, 0, {"val/loss": 3.0})
        first = cb.best_path
        cb.on_epoch_end(trainer, 1, {"val/loss": 2.0})
        assert os.path.isdir(first) and os.path.isdir(cb.best_path)
