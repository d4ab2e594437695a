"""Hyperparameter search driver (reference configs/hparams_search/*.yaml —
Optuna-based there; here a built-in TPE-free random/grid sweeper with the
same config surface: a search space of overrides, `optimized_metric`,
direction and n_trials)."""

from __future__ import annotations

import random
from typing import Any, Dict, List

from medmoe_tpu.config import DotDict, compose
from medmoe_tpu.utils.logging import get_logger
from medmoe_tpu.utils.task import get_metric_value

log = get_logger(__name__)


def _sample(space: Dict[str, Any], rng: random.Random) -> Dict[str, Any]:
    """One draw from the search space. Entries are either
    {low, high[, log]} intervals or {choices: [...]}."""
    draw = {}
    for key, spec in space.items():
        if isinstance(spec, dict) and "choices" in spec:
            draw[key] = rng.choice(list(spec["choices"]))
        elif isinstance(spec, dict) and "low" in spec:
            lo, hi = float(spec["low"]), float(spec["high"])
            if spec.get("log"):
                import math

                draw[key] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
            else:
                draw[key] = rng.uniform(lo, hi)
            if spec.get("int"):
                draw[key] = int(round(draw[key]))
        elif isinstance(spec, list):
            draw[key] = rng.choice(spec)
        else:
            draw[key] = spec
    return draw


def run_sweep(cfg: DotDict, base_overrides: List[str]) -> Dict[str, float]:
    from medmoe_tpu.cli.train import train

    hs = cfg.hparams_search
    metric = hs.get("optimized_metric", cfg.get("optimized_metric",
                                                "val/loss"))
    direction = hs.get("direction", "minimize")
    n_trials = int(hs.get("n_trials", 10))
    space = hs.get("params", {})
    rng = random.Random(int(hs.get("seed", cfg.get("seed") or 0)))

    best_value = None
    best_params: Dict[str, Any] = {}
    for trial in range(n_trials):
        draw = _sample(space, rng)
        trial_overrides = [o for o in base_overrides
                           if not o.lstrip("~+").startswith("hparams_search")]
        trial_overrides += [f"{k}={v}" for k, v in draw.items()]
        trial_cfg = compose("train", trial_overrides)
        trial_cfg["hparams_search"] = None
        log.info(f"trial {trial}: {draw}")
        metrics, _ = train(trial_cfg)
        value = get_metric_value(metrics, metric)
        better = (best_value is None
                  or (direction == "minimize" and value < best_value)
                  or (direction == "maximize" and value > best_value))
        if better:
            best_value, best_params = value, draw
        log.info(f"trial {trial}: {metric}={value} (best={best_value})")

    log.info(f"sweep done: best {metric}={best_value} with {best_params}")
    return {metric: best_value, **{f"best/{k}": v
                                   for k, v in best_params.items()}}
