"""Zero-shot eval CLI (reference configs/eval_zs.yaml — whose entry file
src/eval_zs.py was empty; rebuilt per SURVEY §3.4).

    python -m medmoe_tpu.cli.eval_zs data=chexpert ckpt_path=...
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List, Optional

from medmoe_tpu.config import compose
from medmoe_tpu.eval.zero_shot import run_eval_zs
from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    overrides = list(argv if argv is not None else sys.argv[1:])
    from medmoe_tpu.cli._help import maybe_print_help

    if maybe_print_help(
            overrides, "python -m medmoe_tpu.cli.eval_zs",
            "Zero-shot classification / retrieval / linear probing.",
            ["python -m medmoe_tpu.cli.eval_zs data=chexpert ckpt_path=...",
             "python -m medmoe_tpu.cli.eval_zs data=unimed "
             "eval.protocol=retrieval ckpt_path=..."]):
        return {}
    cfg = compose("eval_zs", overrides)
    from medmoe_tpu.utils.task import extras

    extras(cfg)     # warnings/tags/config-print + persistent compile cache
    import jax

    if cfg.get("accelerator") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    metrics = run_eval_zs(cfg)
    log.info("eval_zs results: " + json.dumps(metrics, indent=2))
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
