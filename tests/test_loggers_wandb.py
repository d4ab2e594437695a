"""WandbLogger parity knobs (reference configs/logger/wandb.yaml:4-16):
`offline`, `id` run-resume, and `log_model` checkpoint-artifact upload wired
to the ModelCheckpoint callback. Exercised against a stub wandb backend
(this image has no wandb SDK and no egress)."""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np


class _FakeArtifact:
    def __init__(self, name, type, metadata=None):
        self.name = name
        self.type = type
        self.metadata = metadata
        self.dirs = []
        self.files = []

    def add_dir(self, path):
        self.dirs.append(path)

    def add_file(self, path):
        self.files.append(path)


class _FakeRun:
    def __init__(self, **kwargs):
        self.init_kwargs = kwargs
        self.id = kwargs.get("id") or "fake-run"
        self.logged = []
        self.artifacts = []
        self.config = types.SimpleNamespace(update=lambda *a, **k: None)
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((dict(metrics), step))

    def log_artifact(self, artifact, aliases=None):
        self.artifacts.append((artifact, list(aliases or [])))

    def finish(self):
        self.finished = True


def _install_stub_wandb(monkeypatch):
    stub = types.ModuleType("wandb")
    runs = []

    def init(**kwargs):
        run = _FakeRun(**kwargs)
        runs.append(run)
        return run

    stub.init = init
    stub.Artifact = _FakeArtifact
    monkeypatch.setitem(sys.modules, "wandb", stub)
    return runs


class TestWandbKnobs:
    def test_offline_id_resume_and_prefix(self, tmp_path, monkeypatch):
        runs = _install_stub_wandb(monkeypatch)
        from medmoe_tpu.utils.loggers import WandbLogger

        lg = WandbLogger(save_dir=str(tmp_path), offline=True, id="run-42",
                         prefix="pre/", name="myrun", job_type="train")
        kw = runs[0].init_kwargs
        assert kw["mode"] == "offline"
        assert kw["id"] == "run-42"
        assert kw["resume"] == "must"     # id set → resume that run
        assert kw["name"] == "myrun"
        assert kw["job_type"] == "train"
        lg.log_metrics({"train/loss": 1.5}, step=3)
        assert runs[0].logged == [({"pre/train/loss": 1.5}, 3)]
        lg.finalize()
        assert runs[0].finished

    def test_log_model_uploads_checkpoint_artifact(self, tmp_path,
                                                   monkeypatch):
        runs = _install_stub_wandb(monkeypatch)
        from medmoe_tpu.utils.loggers import WandbLogger

        ckpt = tmp_path / "ckpt_dir"
        ckpt.mkdir()
        lg = WandbLogger(save_dir=str(tmp_path), log_model=True)
        lg.log_checkpoint(str(ckpt), alias="best", metadata={"epoch": 2})
        (artifact, aliases), = runs[0].artifacts
        assert artifact.type == "model"
        assert artifact.dirs == [str(ckpt)]
        assert aliases == ["best"]
        assert artifact.metadata["epoch"] == 2

        # log_model=False → no artifact
        lg2 = WandbLogger(save_dir=str(tmp_path), log_model=False)
        lg2.log_checkpoint(str(ckpt), alias="best")
        assert runs[1].artifacts == []

    def test_fallback_records_checkpoint_event(self, tmp_path):
        """Without the wandb SDK the logger must still record the artifact
        intent (JSONL), so runs on this image remain auditable."""
        from medmoe_tpu.utils.loggers import WandbLogger

        assert "wandb" not in sys.modules or \
            not hasattr(sys.modules.get("wandb"), "__file__")
        lg = WandbLogger(save_dir=str(tmp_path), log_model=True)
        assert lg._run is None
        lg.log_checkpoint(str(tmp_path / "ck"), alias="last",
                          metadata={"epoch": 1})
        with open(tmp_path / "wandb_fallback.jsonl") as f:
            rec = json.loads(f.readline())
        assert rec["event"] == "checkpoint"
        assert rec["alias"] == "last"
        assert rec["epoch"] == 1

    def test_config_carries_reference_keys(self):
        from medmoe_tpu.config import compose

        cfg = compose("train", ["experiment=pretraining_medmoe",
                                "logger=wandb"])
        w = cfg.logger.wandb
        assert w.log_model is True       # reference wandb.yaml:12
        assert w.offline is False
        assert w.id is None
        assert w.prefix == ""


class TestModelCheckpointAnnounce:
    def test_callback_offers_best_and_last_to_loggers(self, tmp_path):
        from medmoe_tpu.train.callbacks import ModelCheckpoint

        class RecordingLogger:
            def __init__(self):
                self.calls = []

            def log_checkpoint(self, path, alias="last", metadata=None):
                self.calls.append((path, alias, dict(metadata or {})))

        class State:
            step = np.asarray(0)
            params = {"w": np.zeros((2,), np.float32)}
            opt_state = {"m": np.zeros((2,), np.float32)}

        rec = RecordingLogger()
        trainer = types.SimpleNamespace(
            state=State(), loggers=[rec], default_root_dir=str(tmp_path))
        cb = ModelCheckpoint(dirpath=str(tmp_path / "ckpts"))
        cb.on_epoch_end(trainer, 0, {"val/loss": 1.0})
        aliases = [alias for _, alias, _ in rec.calls]
        assert aliases == ["best", "last"]
        best_path, _, meta = rec.calls[0]
        assert os.path.isdir(best_path)
        assert meta["epoch"] == 0 and meta["val/loss"] == 1.0

        # no improvement → only 'last' re-announced
        rec.calls.clear()
        cb.on_epoch_end(trainer, 1, {"val/loss": 2.0})
        assert [alias for _, alias, _ in rec.calls] == ["last"]


class TestAsyncBlockingDecision:
    """Async saves must engage for ordinary loggers: every backend inherits
    a no-op ``log_checkpoint`` from BaseLogger, so 'has the attribute' is
    not the artifact-capability test — only an OVERRIDING hook (and, where
    the knob exists, ``log_model`` on) forces blocking saves."""

    def _capture_blocking(self, monkeypatch, loggers, tmp_path):
        import medmoe_tpu.utils.checkpoint as ckpt_mod
        from medmoe_tpu.train.callbacks import ModelCheckpoint

        calls = []
        monkeypatch.setattr(
            ckpt_mod, "save_checkpoint",
            lambda path, state, extra=None, blocking=True:
                calls.append(blocking))
        trainer = types.SimpleNamespace(
            state=None, loggers=loggers, default_root_dir=str(tmp_path))
        cb = ModelCheckpoint(dirpath=str(tmp_path / "ck"), async_save=True)
        cb.on_epoch_end(trainer, 0, {"val/loss": 1.0})
        assert calls, "no save issued"
        return calls

    def test_csv_logger_keeps_async(self, tmp_path, monkeypatch):
        from medmoe_tpu.utils.loggers import CSVLogger

        calls = self._capture_blocking(
            monkeypatch, [CSVLogger(str(tmp_path))], tmp_path)
        assert all(b is False for b in calls)

    def test_no_loggers_keeps_async(self, tmp_path, monkeypatch):
        calls = self._capture_blocking(monkeypatch, [], tmp_path)
        assert all(b is False for b in calls)

    def test_wandb_log_model_forces_blocking(self, tmp_path, monkeypatch):
        from medmoe_tpu.utils.loggers import WandbLogger

        lg = WandbLogger(str(tmp_path), log_model=True)
        calls = self._capture_blocking(monkeypatch, [lg], tmp_path)
        assert all(b is True for b in calls)

    def test_wandb_without_log_model_keeps_async(self, tmp_path,
                                                 monkeypatch):
        from medmoe_tpu.utils.loggers import WandbLogger

        lg = WandbLogger(str(tmp_path), log_model=False)
        calls = self._capture_blocking(monkeypatch, [lg], tmp_path)
        assert all(b is False for b in calls)

    def test_duck_typed_artifact_logger_forces_blocking(self, tmp_path,
                                                        monkeypatch):
        class Custom:                      # not a BaseLogger subclass
            def log_checkpoint(self, path, alias="last", metadata=None):
                pass

        calls = self._capture_blocking(monkeypatch, [Custom()], tmp_path)
        assert all(b is True for b in calls)
