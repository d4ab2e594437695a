"""Supervised eval CLI (reference src/eval.py — empty file in the reference;
rebuilt from configs/eval.yaml): restore a checkpoint and run the test loop.

    python -m medmoe_tpu.cli.eval data=synthetic ckpt_path=...
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List, Optional

from medmoe_tpu.config import compose
from medmoe_tpu.utils import instantiate, instantiate_dict
from medmoe_tpu.utils.logging import get_logger
from medmoe_tpu.utils.task import extras, task_wrapper

log = get_logger(__name__)


@task_wrapper
def evaluate(cfg) -> Dict[str, float]:
    import jax

    if cfg.select("trainer.accelerator") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    datamodule = instantiate(cfg.data)
    module = instantiate(cfg.model)
    tokenizer = getattr(datamodule, "tokenizer", None)
    if tokenizer is not None:
        module.text_cfg["vocab_size"] = max(
            int(module.text_cfg.get("vocab_size", 0)), tokenizer.vocab_size)
    loggers = instantiate_dict(cfg.get("logger"))
    trainer_cfg = dict(cfg.get("trainer") or {})
    trainer_cfg.setdefault("_target_", "medmoe_tpu.train.loop.Trainer")
    trainer = instantiate(trainer_cfg, loggers=loggers,
                          seed=cfg.get("seed") or 0)
    metrics = trainer.test(module, datamodule, ckpt_path=cfg.get("ckpt_path"))
    log.info("eval results: " + json.dumps(metrics, indent=2))
    return metrics


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    overrides = list(argv if argv is not None else sys.argv[1:])
    from medmoe_tpu.cli._help import maybe_print_help

    if maybe_print_help(
            overrides, "python -m medmoe_tpu.cli.eval",
            "Run the test loop from a checkpoint (reference configs/eval.yaml).",
            ["python -m medmoe_tpu.cli.eval ckpt_path=<orbax-dir> data=unimed"]):
        return {}
    cfg = compose("eval", overrides)
    extras(cfg)
    metrics = evaluate(cfg)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
