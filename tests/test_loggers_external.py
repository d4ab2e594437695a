"""ExternalLogger backends (reference configs/logger/{comet,mlflow,neptune,
aim}.yaml) exercised against stub SDK modules — none of these SDKs ship in
this image, so without stubs the adapter was only ever compose-tested.
Asserts each backend's real API usage (mlflow key sanitization, neptune
per-key append, aim track, comet log_metrics) and the JSONL degradation
when the SDK is absent or a call raises."""

from __future__ import annotations

import json
import sys
import types


def _mk_module(name):
    return types.ModuleType(name)


class TestMlflow:
    def test_metrics_and_key_sanitization(self, tmp_path, monkeypatch):
        stub = _mk_module("mlflow")
        calls = {"uri": None, "runs": [], "metrics": []}
        stub.set_tracking_uri = lambda uri: calls.__setitem__("uri", uri)
        stub.start_run = lambda run_name=None: calls["runs"].append(run_name)
        stub.log_metrics = lambda m, step=None: calls["metrics"].append(
            (dict(m), step))
        monkeypatch.setitem(sys.modules, "mlflow", stub)
        from medmoe_tpu.utils.loggers import MLFlowLogger

        lg = MLFlowLogger(save_dir=str(tmp_path), run_name="r1")
        assert calls["uri"] == f"file:{tmp_path}/mlruns"
        assert calls["runs"] == ["r1"]
        lg.log_metrics({"train/loss": 1.5, "val/acc": 0.5}, step=7)
        # mlflow forbids '/' in metric keys → sanitized to '_'
        assert calls["metrics"] == [
            ({"train_loss": 1.5, "val_acc": 0.5}, 7)]


class TestComet:
    def test_experiment_receives_metrics(self, tmp_path, monkeypatch):
        stub = _mk_module("comet_ml")
        experiments = []

        class Experiment:
            def __init__(self, **kw):
                self.kw = kw
                self.metrics = []
                experiments.append(self)

            def log_metrics(self, m, step=None):
                self.metrics.append((dict(m), step))

        stub.Experiment = Experiment
        monkeypatch.setitem(sys.modules, "comet_ml", stub)
        from medmoe_tpu.utils.loggers import CometLogger

        lg = CometLogger(save_dir=str(tmp_path), project_name="medmoe")
        assert experiments[0].kw == {"project_name": "medmoe"}
        lg.log_metrics({"train/loss": 2.0}, step=1)
        assert experiments[0].metrics == [({"train/loss": 2.0}, 1)]


class TestNeptune:
    def test_per_key_append(self, tmp_path, monkeypatch):
        stub = _mk_module("neptune")
        appended = []

        class _Series:
            def __init__(self, key):
                self.key = key

            def append(self, value, step=None):
                appended.append((self.key, value, step))

        class _Run:
            def __getitem__(self, key):
                return _Series(key)

        stub.init_run = lambda **kw: _Run()
        monkeypatch.setitem(sys.modules, "neptune", stub)
        from medmoe_tpu.utils.loggers import NeptuneLogger

        lg = NeptuneLogger(save_dir=str(tmp_path))
        lg.log_metrics({"train/loss": 3.0, "lr": 0.1}, step=2)
        assert sorted(appended) == [("lr", 0.1, 2), ("train/loss", 3.0, 2)]


class TestAim:
    def test_track_per_metric(self, tmp_path, monkeypatch):
        stub = _mk_module("aim")
        tracked = []

        class Run:
            def __init__(self, repo=None):
                self.repo = repo

            def track(self, value, name=None, step=None):
                tracked.append((name, value, step))

        stub.Run = Run
        monkeypatch.setitem(sys.modules, "aim", stub)
        from medmoe_tpu.utils.loggers import AimLogger

        lg = AimLogger(save_dir=str(tmp_path))
        assert lg._impl.repo == str(tmp_path)
        lg.log_metrics({"train/loss": 4.0}, step=9)
        assert tracked == [("train/loss", 4.0, 9)]


class TestDegradation:
    def test_missing_sdk_falls_back_to_jsonl(self, tmp_path):
        for name in ("comet_ml", "mlflow", "neptune", "aim"):
            assert name not in sys.modules or \
                not hasattr(sys.modules.get(name), "__file__")
        from medmoe_tpu.utils.loggers import (AimLogger, CometLogger,
                                              MLFlowLogger, NeptuneLogger)

        for ctor, backend in [(CometLogger, "comet"), (MLFlowLogger, "mlflow"),
                              (NeptuneLogger, "neptune"), (AimLogger, "aim")]:
            lg = ctor(save_dir=str(tmp_path))
            assert lg._impl is None
            lg.log_metrics({"train/loss": 1.0}, step=5)
            with open(tmp_path / f"{backend}_fallback.jsonl") as f:
                rec = json.loads(f.readline())
            assert rec["step"] == 5 and rec["train/loss"] == 1.0

    def test_raising_backend_falls_back(self, tmp_path, monkeypatch):
        """A backend that explodes mid-run must not take training down —
        metrics land in the fallback JSONL instead."""
        stub = _mk_module("aim")

        class Run:
            def __init__(self, repo=None):
                pass

            def track(self, *a, **kw):
                raise RuntimeError("backend down")

        stub.Run = Run
        monkeypatch.setitem(sys.modules, "aim", stub)
        from medmoe_tpu.utils.loggers import AimLogger

        lg = AimLogger(save_dir=str(tmp_path))
        lg.log_metrics({"train/loss": 6.0}, step=1)   # must not raise
        with open(tmp_path / "aim_fallback.jsonl") as f:
            rec = json.loads(f.readline())
        assert rec["train/loss"] == 6.0


class TestCSVHistoryPreserved:
    def test_fit_then_test_keeps_training_rows(self, tmp_path):
        """metrics.csv must survive finalize() + later logging (the fit ->
        trainer.test flow) and resumed runs: the rewrite re-reads existing
        rows from DISK, not only from an open handle."""
        import csv

        from medmoe_tpu.utils.loggers import CSVLogger

        lg = CSVLogger(str(tmp_path))
        lg.log_metrics({"train/loss": 1.0}, step=1)
        lg.log_metrics({"train/loss": 0.5}, step=2)
        lg.finalize()                       # fit() ends
        lg.log_metrics({"test/acc": 0.9}, step=3)   # trainer.test logs
        lg.finalize()
        with open(tmp_path / "csv" / "metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3               # training history NOT truncated
        assert rows[0]["train/loss"] == "1.0"
        assert rows[2]["test/acc"] == "0.9"

        # a fresh logger instance writing into the same dir (resume) also
        # preserves the file
        lg2 = CSVLogger(str(tmp_path))
        lg2.log_metrics({"train/loss": 0.4}, step=4)
        lg2.finalize()
        with open(tmp_path / "csv" / "metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 4 and rows[0]["train/loss"] == "1.0"
