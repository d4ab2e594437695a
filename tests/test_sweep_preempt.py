"""TPE hyperparameter search, --multirun expansion, and preemption
(checkpoint-on-signal) elasticity."""

import math
import os

import numpy as np
import pytest


class TestTPE:
    def test_tpe_concentrates_on_optimum_numeric(self):
        from medmoe_tpu.train.sweep import TPESampler

        space = {"x": {"low": 0.0, "high": 1.0}}
        tpe = TPESampler(space, seed=0, n_startup_trials=6)
        history = []
        for _ in range(40):
            draw = tpe.suggest(history)
            value = (draw["x"] - 0.7) ** 2
            history.append((draw, value))
        best = min(v for _, v in history)
        assert best < 1e-3
        late = [d["x"] for d, _ in history[-10:]]
        early = [d["x"] for d, _ in history[:6]]
        assert abs(np.mean(late) - 0.7) < abs(np.mean(early) - 0.7)
        assert np.std(late) < 0.2        # exploitation, not uniform noise

    def test_tpe_log_scale(self):
        from medmoe_tpu.train.sweep import TPESampler

        space = {"lr": {"low": 1e-6, "high": 1e-1, "log": True}}
        tpe = TPESampler(space, seed=1, n_startup_trials=6)
        history = []
        for _ in range(40):
            draw = tpe.suggest(history)
            value = (math.log10(draw["lr"]) + 4.0) ** 2   # optimum 1e-4
            history.append((draw, value))
        best_draw = min(history, key=lambda dv: dv[1])[0]
        assert 1e-5 < best_draw["lr"] < 1e-3

    def test_tpe_categorical_prefers_winner(self):
        from medmoe_tpu.train.sweep import TPESampler

        space = {"c": {"choices": ["bad1", "good", "bad2"]}}
        tpe = TPESampler(space, seed=2, n_startup_trials=5)
        history = []
        for _ in range(30):
            draw = tpe.suggest(history)
            value = 0.0 if draw["c"] == "good" else 1.0
            value += np.random.RandomState(len(history)).rand() * 0.1
            history.append((draw, value))
        late = [d["c"] for d, _ in history[-10:]]
        assert late.count("good") >= 8

    def test_tpe_int_param(self):
        from medmoe_tpu.train.sweep import TPESampler

        space = {"n": {"low": 1, "high": 64, "int": True}}
        tpe = TPESampler(space, seed=3, n_startup_trials=3)
        history = []
        for _ in range(10):
            draw = tpe.suggest(history)
            assert isinstance(draw["n"], int) and 1 <= draw["n"] <= 64
            history.append((draw, abs(draw["n"] - 32)))


class TestMultirunExpansion:
    def test_comma_sweep_cartesian(self):
        from medmoe_tpu.cli.train import _expand_multirun

        jobs = _expand_multirun(["experiment=x", "seed=1,2",
                                 "model.lr=0.1,0.2"])
        assert len(jobs) == 4
        assert ["experiment=x", "seed=1", "model.lr=0.1"] in jobs
        assert ["experiment=x", "seed=2", "model.lr=0.2"] in jobs

    def test_bracketed_lists_are_not_swept(self):
        from medmoe_tpu.cli.train import _expand_multirun

        jobs = _expand_multirun(["model.depths=[1,1]", "seed=1,2"])
        assert len(jobs) == 2
        assert all("model.depths=[1,1]" in j for j in jobs)

    def test_no_sweep_is_single_job(self):
        from medmoe_tpu.cli.train import _expand_multirun

        assert _expand_multirun(["a=1", "b=2"]) == [["a=1", "b=2"]]


class TestSubprocessLauncher:
    def test_launcher_key_composes(self):
        from medmoe_tpu.config import compose

        cfg = compose("train", ["experiment=pretraining_medmoe",
                                "hparams_search=medmoe_tpe"])
        assert cfg.hparams_search.launcher == "in_process"
        cfg = compose("train", ["experiment=pretraining_medmoe",
                                "hparams_search=medmoe_tpe",
                                "hparams_search.launcher=subprocess"])
        assert cfg.hparams_search.launcher == "subprocess"

    def test_subprocess_mode_keeps_sampler_in_parent(self, monkeypatch):
        """launcher=subprocess must isolate only trial EXECUTION: the
        sampler history accumulates in the parent so TPE state survives
        across trials (VERDICT r4 #9)."""
        from medmoe_tpu.config import compose
        from medmoe_tpu.train import sweep as sweep_mod

        calls = []

        def fake_subprocess(trial_overrides, metric):
            calls.append(list(trial_overrides))
            # decreasing losses keyed on the lr draw → deterministic best
            lr = [float(o.split("=")[1]) for o in trial_overrides
                  if o.startswith("model.optimizer.lr=")][0]
            return abs(math.log10(lr) + 4.0)

        monkeypatch.setattr(sweep_mod, "_run_trial_subprocess",
                            fake_subprocess)
        cfg = compose("train", [
            "experiment=pretraining_medmoe", "hparams_search=medmoe_tpe",
            "hparams_search.launcher=subprocess",
            "hparams_search.n_trials=6", "hparams_search.n_startup_trials=2",
            "~hparams_search.params.data.batch_size",
            "~hparams_search.params.model.loss.classifier_loss_weight"])
        out = sweep_mod.run_sweep(cfg, ["experiment=pretraining_medmoe",
                                        "hparams_search=medmoe_tpe"])
        assert len(calls) == 6
        # hparams_search overrides are stripped from the child's argv
        # (run_sweep filters them; _run_trial_subprocess then appends
        # hparams_search=null so the child cannot recurse into run_sweep)
        for argv in calls:
            assert not any(o.startswith("hparams_search") for o in argv)
        assert "best/model.optimizer.lr" in out
        best_lr = out["best/model.optimizer.lr"]
        assert out["val/loss"] == abs(math.log10(best_lr) + 4.0)
        # the TPE model exploited parent-held history: later draws
        # concentrate around the optimum more than the startup draws
        lrs = [[float(o.split("=")[1]) for o in argv
                if o.startswith("model.optimizer.lr=")][0] for argv in calls]
        late_err = np.mean([abs(math.log10(v) + 4.0) for v in lrs[-2:]])
        early_err = np.mean([abs(math.log10(v) + 4.0) for v in lrs[:2]])
        assert late_err <= early_err + 1.0

    def test_failed_subprocess_trial_does_not_kill_sweep(self, monkeypatch):
        from medmoe_tpu.config import compose
        from medmoe_tpu.train import sweep as sweep_mod

        n = {"calls": 0}

        def flaky(trial_overrides, metric):
            n["calls"] += 1
            if n["calls"] == 1:
                raise RuntimeError("trial subprocess exited 1: boom")
            return float(n["calls"])

        monkeypatch.setattr(sweep_mod, "_run_trial_subprocess", flaky)
        cfg = compose("train", [
            "experiment=pretraining_medmoe", "hparams_search=medmoe_tpe",
            "hparams_search.launcher=subprocess",
            "hparams_search.n_trials=3"])
        out = sweep_mod.run_sweep(cfg, [])
        assert n["calls"] == 3
        assert out["val/loss"] == 2.0     # first surviving trial is best


@pytest.mark.slow
class TestSweepE2E:
    def test_two_trial_subprocess_sweep(self, tmp_path):
        """Real 2-trial subprocess fan-out: each trial is its own
        `python -m medmoe_tpu.cli.train` OS process reporting through the
        MEDMOE_METRICS_OUT contract."""
        from medmoe_tpu.cli.train import main
        from tests.test_train_loop import TINY_OVERRIDES

        metrics = main(["experiment=pretraining_medmoe",
                        "hparams_search=medmoe_tpe"] + TINY_OVERRIDES + [
            f"paths.root_dir={tmp_path}", "debug=fdr",
            "trainer.accumulate_grad_batches=1",
            "hparams_search.launcher=subprocess",
            "hparams_search.n_trials=2",
            "hparams_search.n_startup_trials=2",
            "~hparams_search.params.data.batch_size",
            "~hparams_search.params.model.loss.classifier_loss_weight",
            "optimized_metric=train/loss"])
        assert "train/loss" in metrics
        assert np.isfinite(metrics["train/loss"])
        assert "best/model.optimizer.lr" in metrics
    def test_tpe_sweep_over_tiny_trains(self, tmp_path):
        from medmoe_tpu.cli.train import main
        from tests.test_train_loop import TINY_OVERRIDES

        metrics = main(["experiment=pretraining_medmoe",
                        "hparams_search=medmoe_tpe"] + TINY_OVERRIDES + [
            f"paths.root_dir={tmp_path}", "debug=fdr",
            "trainer.accumulate_grad_batches=1",
            "hparams_search.n_trials=3",
            "hparams_search.n_startup_trials=2",
            # sweep only the lr (batch/classifier sweeps need real data)
            "~hparams_search.params.data.batch_size",
            "~hparams_search.params.model.loss.classifier_loss_weight",
            "optimized_metric=train/loss"])
        assert "train/loss" in metrics
        assert np.isfinite(metrics["train/loss"])
        assert "best/model.optimizer.lr" in metrics

    def test_multirun_survives_one_failed_job(self, tmp_path):
        from medmoe_tpu.cli.train import main
        from tests.test_train_loop import TINY_OVERRIDES

        # second job has an invalid experts count → fails; multirun continues
        metrics = main(["-m", "experiment=pretraining_medmoe"]
                       + TINY_OVERRIDES + [
            f"paths.root_dir={tmp_path}", "debug=fdr",
            "trainer.accumulate_grad_batches=1",
            "model.model.vision.num_experts=3,0"])
        assert metrics["multirun/n_jobs"] == 2.0
        assert metrics["multirun/n_failed"] == 1.0
        assert "job0/train/loss" in metrics


@pytest.mark.slow
class TestPreemption:
    def test_preempt_checkpoints_and_resumes(self, tmp_path):
        """request_preemption mid-epoch → 'last' checkpoint + clean stop;
        a fresh Trainer resumes from it and re-runs the interrupted epoch
        (reference: submitit SIGUSR1@90 + requeue,
        configs/hydra/launcher/base_submitit_slurm.yaml:25)."""
        import jax

        from medmoe_tpu.data.datamodules import SyntheticDataModule
        from medmoe_tpu.train.callbacks import ModelCheckpoint
        from medmoe_tpu.train.loop import Trainer
        from tests.helpers import tiny_module

        class PreemptingDM(SyntheticDataModule):
            trainer = None

            def train_dataloader(self, epoch=0):
                base = super().train_dataloader(epoch)

                def gen():
                    for i, b in enumerate(base):
                        if i == 2 and self.trainer is not None:
                            self.trainer.request_preemption()
                        yield b

                return gen()

        mod = tiny_module()
        dm = PreemptingDM(num_samples=16, batch_size=4, image_size=56,
                          num_classes=3, max_length=10)
        ckpt_dir = str(tmp_path / "ckpts")
        trainer = Trainer(max_epochs=3, accelerator="cpu", devices=1,
                          num_sanity_val_steps=0, check_val_every_n_epoch=100,
                          callbacks=[ModelCheckpoint(dirpath=ckpt_dir)],
                          default_root_dir=str(tmp_path))
        dm.trainer = trainer
        trainer.fit(mod, dm)
        assert trainer.interrupted
        last = os.path.join(ckpt_dir, "last")
        assert os.path.isdir(last)
        import json

        with open(last + ".meta.json") as f:
            meta = json.load(f)
        assert meta["preempted"] is True
        assert meta["epoch"] == -1      # epoch 0 interrupted → re-run it

        # resume: runs to completion from the preemption checkpoint
        dm2 = SyntheticDataModule(num_samples=16, batch_size=4,
                                  image_size=56, num_classes=3,
                                  max_length=10)
        trainer2 = Trainer(max_epochs=1, accelerator="cpu", devices=1,
                           num_sanity_val_steps=0,
                           check_val_every_n_epoch=1,
                           default_root_dir=str(tmp_path))
        trainer2.fit(tiny_module(), dm2, ckpt_path=last)
        assert not trainer2.interrupted
        assert len(trainer2.metrics_history) == 1
