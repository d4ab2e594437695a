"""Trainer callbacks (reference configs/callbacks/default.yaml surface):
ModelCheckpoint (orbax-backed), EarlyStopping, ModelSummary."""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional


class Callback:
    def on_train_start(self, trainer) -> None: ...
    def on_epoch_end(self, trainer, epoch: int,
                     metrics: Dict[str, float]) -> None: ...
    def on_train_end(self, trainer) -> None: ...

    @property
    def should_stop(self) -> bool:
        return False


def _reads_checkpoint_files(logger) -> bool:
    """True only for loggers that will actually READ the checkpoint files
    at announce time (e.g. WandbLogger with ``log_model`` enabled).

    Every logger inherits a no-op ``log_checkpoint`` from BaseLogger, so
    "has the attribute" is not the test — that would force every default
    ``logger=csv`` run back to blocking saves and silently disable the
    async path. The hook must be an OVERRIDE, and (when the logger exposes
    the knob) ``log_model`` must be on."""
    hook = getattr(type(logger), "log_checkpoint", None)
    if hook is None:
        return False
    try:
        from medmoe_tpu.utils.loggers import BaseLogger

        if hook is BaseLogger.log_checkpoint:
            return False
    except Exception:
        pass
    return bool(getattr(logger, "log_model", True))


class ModelCheckpoint(Callback):
    """Monitors a metric, keeps best + last orbax checkpoints
    (reference ModelCheckpoint: monitor val/loss, save_last, top-1)."""

    def __init__(self, dirpath: str = "checkpoints",
                 filename: str = "epoch_{epoch:03d}",
                 monitor: str = "val/loss", mode: str = "min",
                 save_last: bool = True, save_top_k: int = 1,
                 auto_insert_metric_name: bool = False,
                 async_save: bool = True):
        # Lightning semantics: null dirpath/filename fall back to defaults
        # (the config group ships them as null, reference
        # configs/callbacks/model_checkpoint.yaml); a null dirpath resolves
        # under the trainer's root dir at save time, not the process cwd.
        self.dirpath = dirpath
        self.filename = filename or "epoch_{epoch:03d}"
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.save_top_k = save_top_k
        self.async_save = async_save
        self.best_value = math.inf if mode == "min" else -math.inf
        self.best_path: Optional[str] = None
        #: kept monitored checkpoints, best-first: [(score, path)] where
        #: score is mode-normalized (smaller is better)
        self._kept: list = []

    def _is_better(self, value: float) -> bool:
        return value < self.best_value if self.mode == "min" \
            else value > self.best_value

    def _score(self, value: float) -> float:
        return value if self.mode == "min" else -value

    def _prune_kept(self) -> None:
        """Lightning save_top_k semantics: drop outperformed checkpoints
        beyond k (save_top_k=-1 keeps everything). Evicted paths were
        written at least one save-barrier ago (the CURRENT save's async
        barrier waits on the previous write), so deleting them never races
        an in-flight write."""
        if self.save_top_k < 0:
            return
        import shutil

        self._kept.sort(key=lambda sp: sp[0])
        while len(self._kept) > self.save_top_k:
            _, path = self._kept.pop()           # worst
            if any(path == p for _, p in self._kept):
                continue                         # same path still kept
            shutil.rmtree(path, ignore_errors=True)
            try:
                os.remove(path + ".meta.json")
            except OSError:
                pass

    def on_epoch_end(self, trainer, epoch: int,
                     metrics: Dict[str, float]) -> None:
        from medmoe_tpu.utils.checkpoint import save_checkpoint

        loop_extra = getattr(trainer, "checkpoint_extra", dict)()
        dirpath = self.dirpath or os.path.join(
            getattr(trainer, "default_root_dir", "."), "checkpoints")
        # artifact-capable loggers read the checkpoint FILES at announce
        # time — an in-flight async write would hand them a half-written
        # (or not-yet-renamed) directory, so those runs save blocking
        blocking = (not self.async_save) or any(
            _reads_checkpoint_files(lg)
            for lg in getattr(trainer, "loggers", []) or [])
        value = metrics.get(self.monitor)
        if self.save_top_k != 0 and value is not None \
                and self._is_better(float(value)):
            self.best_value = float(value)
            name = self.filename.format(epoch=epoch)
            self.best_path = os.path.join(dirpath, name)
            save_checkpoint(self.best_path, trainer.state,
                            extra={"epoch": epoch, self.monitor: value,
                                   **loop_extra}, blocking=blocking)
            self._kept.append((self._score(float(value)), self.best_path))
            self._prune_kept()          # outperformed ckpts beyond top-k go
            self._announce(trainer, self.best_path, "best",
                           {"epoch": epoch, self.monitor: float(value)})
        if self.save_last:
            last_path = os.path.join(dirpath, "last")
            save_checkpoint(last_path, trainer.state,
                            extra={"epoch": epoch, **loop_extra},
                            blocking=blocking)
            self._announce(trainer, last_path, "last", {"epoch": epoch})

    def on_train_end(self, trainer) -> None:
        """Commit any in-flight async save before fit() returns — callers
        (trainer.test(ckpt_path=best), sweeps, process exit) may read the
        path immediately."""
        from medmoe_tpu.utils.checkpoint import finalize_saves

        finalize_saves()

    @staticmethod
    def _announce(trainer, path: str, alias: str,
                  metadata: Dict[str, Any]) -> None:
        """Offer the saved checkpoint to artifact-capable loggers
        (reference wandb.yaml `log_model: True` uploads Lightning ckpts)."""
        for logger in getattr(trainer, "loggers", []) or []:
            hook = getattr(logger, "log_checkpoint", None)
            if hook is not None:
                hook(path, alias=alias, metadata=metadata)


class EarlyStopping(Callback):
    """Stops on plateau or non-finite monitored metric (reference
    early_stopping.yaml: monitor val/loss, check_finite)."""

    def __init__(self, monitor: str = "val/loss", patience: int = 100,
                 mode: str = "min", min_delta: float = 0.0,
                 check_finite: bool = True):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.check_finite = check_finite
        self.best = math.inf if mode == "min" else -math.inf
        self.bad_epochs = 0
        self._stop = False

    @property
    def should_stop(self) -> bool:
        return self._stop

    def on_epoch_end(self, trainer, epoch: int,
                     metrics: Dict[str, float]) -> None:
        value = metrics.get(self.monitor)
        if value is None:
            return
        value = float(value)
        if self.check_finite and not math.isfinite(value):
            self._stop = True
            return
        improved = (value < self.best - self.min_delta if self.mode == "min"
                    else value > self.best + self.min_delta)
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self._stop = True


class ProgressBar(Callback):
    """Per-epoch progress line (the reference's RichProgressBar analogue,
    reference configs/callbacks/rich_progress_bar.yaml). The TPU trainer's
    hot loop is deliberately non-blocking (metrics stay on device), so
    progress renders once per epoch: epoch counter, wall time, throughput,
    and the monitored losses."""

    def __init__(self, refresh_rate: int = 1):
        self.refresh_rate = max(int(refresh_rate), 1)
        self._n = 0

    def on_epoch_end(self, trainer, epoch: int,
                     metrics: Dict[str, float]) -> None:
        self._n += 1
        if self._n % self.refresh_rate:
            return
        total = getattr(trainer, "max_epochs", "?")
        parts = [f"epoch {epoch + 1}/{total}"]
        if "epoch_time_s" in metrics:
            parts.append(f"{metrics['epoch_time_s']:.1f}s")
        if "pairs_per_sec" in metrics:
            parts.append(f"{metrics['pairs_per_sec']:.1f} pairs/s")
        for key in ("train/loss", "val/loss"):
            if key in metrics:
                parts.append(f"{key}={metrics[key]:.4f}")
        print(" | ".join(parts), flush=True)


class ModelSummary(Callback):
    """Logs parameter counts at train start (reference RichModelSummary +
    log_hyperparameters param counts, src/utils/logging_utils.py:33-57)."""

    def __init__(self, max_depth: int = -1):
        self.max_depth = max_depth

    def on_train_start(self, trainer) -> None:
        import jax

        from medmoe_tpu.utils.logging import get_logger

        params = trainer.state.params
        total = sum(x.size for x in jax.tree_util.tree_leaves(params))
        get_logger(__name__).info(
            f"model parameters: {total / 1e6:.1f}M "
            f"({len(jax.tree_util.tree_leaves(params))} arrays)")
