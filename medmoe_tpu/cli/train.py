"""Train CLI — the reference's ``python src/train.py experiment=...`` surface
(reference src/train.py). Overrides are hydra-style ``key=value`` argv.

Example:
    python -m medmoe_tpu.cli.train experiment=pretraining_medmoe \
        data=synthetic debug=fdr trainer.accelerator=cpu
"""

from __future__ import annotations

import random
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from medmoe_tpu.config import compose, to_dict
from medmoe_tpu.utils import instantiate, instantiate_dict
from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)


def seed_everything(seed: Optional[int]) -> None:
    if seed is None:
        return
    random.seed(seed)
    np.random.seed(seed)


def _apply_accelerator(cfg) -> None:
    """trainer.accelerator=cpu pins the host platform (test/debug parity
    with the reference's trainer=cpu/ddp_sim configs). Honors
    XLA_FLAGS=--xla_force_host_platform_device_count=N or an integer
    trainer.devices for multi-device CPU simulation (this image's
    sitecustomize imports jax early, so the env var alone can be too
    late — jax.config is authoritative)."""
    import os
    import re

    import jax

    accel = cfg.trainer.get("accelerator", "tpu")
    if accel == "cpu":
        jax.config.update("jax_platforms", "cpu")
        n = None
        m = re.search(r"xla_force_host_platform_device_count=(\d+)",
                      os.environ.get("XLA_FLAGS", ""))
        if m:
            n = int(m.group(1))
        devices = cfg.trainer.get("devices")
        if isinstance(devices, int) and devices > 1:
            n = max(n or 0, devices)
        if n:
            try:
                jax.config.update("jax_num_cpu_devices", n)
            except RuntimeError:
                pass   # backend already initialized (e.g. under pytest)


from medmoe_tpu.utils.task import extras, get_metric_value, task_wrapper


@task_wrapper
def train(cfg) -> Tuple[Dict[str, float], Dict]:
    """Mirrors reference src/train.py:42-108: instantiate everything from
    config, fit, optionally test with the best checkpoint."""
    _apply_accelerator(cfg)
    # join the distributed runtime BEFORE the datamodule is built: its
    # constructor reads jax.process_count() (per-process steps_per_epoch),
    # which initializes the backend — the Trainer's own maybe_initialize
    # would come too late for library callers entering via train(cfg)
    from medmoe_tpu.parallel.multihost import maybe_initialize

    maybe_initialize(cfg.trainer.get("num_nodes"))
    seed_everything(cfg.get("seed"))

    log.info(f"instantiating datamodule <{cfg.data._target_}>")
    datamodule = instantiate(cfg.data)

    log.info(f"instantiating module <{cfg.model._target_}>")
    module = instantiate(cfg.model)

    # the embedding table must cover the actual tokenizer vocabulary (a
    # corpus-built test vocab can exceed the configured size); image-only
    # tasks (classification) have no tokenizer
    try:
        tokenizer = getattr(datamodule, "tokenizer", None)
    except FileNotFoundError:
        tokenizer = None
    if tokenizer is not None:
        module.text_cfg["vocab_size"] = max(
            int(module.text_cfg.get("vocab_size", 0)), tokenizer.vocab_size)

    callbacks = instantiate_dict(cfg.get("callbacks"))
    loggers = instantiate_dict(cfg.get("logger"))

    log.info("instantiating trainer")
    trainer = instantiate(cfg.trainer, callbacks=callbacks, loggers=loggers,
                          seed=cfg.get("seed") or 0)

    for logger in loggers:
        logger.log_hyperparams(to_dict(cfg))

    metrics: Dict[str, float] = {}
    if cfg.get("train", True):
        trainer.fit(module, datamodule, ckpt_path=cfg.get("ckpt_path"))
        if trainer.metrics_history:
            metrics.update(trainer.metrics_history[-1])

    if cfg.get("test", False):
        ckpt = trainer.best_model_path
        if not ckpt:
            log.warning("best ckpt not found — testing with current weights")
        metrics.update(trainer.test(module, datamodule, ckpt_path=ckpt))

    return metrics, {"trainer": trainer, "module": module,
                     "datamodule": datamodule}


def _expand_multirun(overrides: List[str]) -> List[List[str]]:
    """Hydra ``--multirun`` comma-sweep syntax: ``key=a,b,c`` values fan out
    into the cartesian product of jobs. Bracketed list values
    (``depths=[1,1]``) are single values, not sweeps."""
    import itertools

    fixed: List[str] = []
    swept: List[List[Tuple[str, str]]] = []
    for o in overrides:
        key, sep, val = o.partition("=")
        if sep and "," in val and not val.lstrip("+~").startswith("["):
            swept.append([(key, v) for v in val.split(",")])
        else:
            fixed.append(o)
    if not swept:
        return [fixed]
    return [fixed + [f"{k}={v}" for k, v in combo]
            for combo in itertools.product(*swept)]


def _run_one(overrides: List[str]) -> Dict[str, float]:
    cfg = compose("train", overrides)
    # pod runs must join the distributed runtime BEFORE any jax device
    # use (seed_everything / instantiate may touch the backend); the
    # Trainer re-checks at construction for library (non-CLI) callers.
    # Platform pinning must come FIRST: maybe_initialize logs
    # process_count, which initializes the backend — on the wrong
    # platform if trainer.accelerator=cpu hasn't been applied yet.
    from medmoe_tpu.parallel.multihost import maybe_initialize

    _apply_accelerator(cfg)
    maybe_initialize(cfg.trainer.get("num_nodes"))
    extras(cfg)
    if cfg.get("hparams_search"):
        from medmoe_tpu.train.sweep import run_sweep

        return run_sweep(cfg, overrides)
    metrics, _ = train(cfg)
    # optimized-metric return for sweepers (reference src/train.py:126-128)
    metric_name = cfg.get("optimized_metric")
    if metric_name:
        get_metric_value(metrics, metric_name)
    return metrics


def _write_metrics_out(metrics: Dict[str, float]) -> Dict[str, float]:
    """Final-metrics json contract for parent drivers: if
    MEDMOE_METRICS_OUT names a path, write the run's metrics there (the
    sweep subprocess launcher and external schedulers read it)."""
    import json
    import os

    out_path = os.environ.get("MEDMOE_METRICS_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()
                       if isinstance(v, (int, float))}, f)
    return metrics


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    overrides = list(argv if argv is not None else sys.argv[1:])
    from medmoe_tpu.cli._help import maybe_print_help

    if maybe_print_help(
            overrides, "python -m medmoe_tpu.cli.train",
            "Train MedMoE (pretraining or classification).",
            ["python -m medmoe_tpu.cli.train experiment=pretraining_medmoe",
             "python -m medmoe_tpu.cli.train experiment=pretraining_medmoe "
             "data=synthetic debug=fdr trainer.accelerator=cpu",
             "python -m medmoe_tpu.cli.train --multirun "
             "experiment=pretraining_medmoe model.loss.temp3=5,10"]):
        return {}
    multirun = False
    for flag in ("-m", "--multirun"):
        while flag in overrides:
            overrides.remove(flag)
            multirun = True
    if not multirun:
        return _write_metrics_out(_run_one(overrides))

    # --multirun: one process runs the sweep jobs sequentially; a failed
    # job is logged and skipped so the multirun survives it (the reference
    # gets this from @task_wrapper + submitit, utils.py:147-175)
    jobs = _expand_multirun(overrides)
    log.info(f"multirun: {len(jobs)} jobs")
    out: Dict[str, float] = {"multirun/n_jobs": float(len(jobs)),
                             "multirun/n_failed": 0.0}
    for i, job in enumerate(jobs):
        log.info(f"multirun job {i}: {job}")
        try:
            metrics = _run_one(job)
        except Exception as e:
            log.warning(f"multirun job {i} FAILED: {e!r}")
            out["multirun/n_failed"] += 1.0
            continue
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                out[f"job{i}/{k}"] = float(v)
    return _write_metrics_out(out)


if __name__ == "__main__":
    main()
