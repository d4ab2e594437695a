"""Export CLI — serialize the deployed encoders to StableHLO artifacts
(medmoe_tpu/eval/export.py; beyond-reference: the reference has no
deployment surface at all, src/eval_zs.py is 0 bytes).

    python -m medmoe_tpu.cli.export ckpt_path=<orbax-dir> export.dir=out/
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List, Optional

from medmoe_tpu.config import compose
from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv: Optional[List[str]] = None) -> Dict:
    overrides = list(argv if argv is not None else sys.argv[1:])
    from medmoe_tpu.cli._help import maybe_print_help

    if maybe_print_help(
            overrides, "python -m medmoe_tpu.cli.export",
            "Export the image/text encoders as StableHLO serving artifacts.",
            ["python -m medmoe_tpu.cli.export ckpt_path=<orbax-dir> "
             "export.dir=out/",
             "python -m medmoe_tpu.cli.export ckpt_path=... "
             "'export.platforms=[tpu]' export.batch=32"]):
        return {}
    cfg = compose("eval_zs", overrides)
    from medmoe_tpu.utils.task import extras

    extras(cfg)
    import jax

    if cfg.get("accelerator") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from medmoe_tpu.eval.export import export_encoders
    from medmoe_tpu.eval.zero_shot import load_for_eval

    # synthetic_init: an export host has a checkpoint, not an eval dataset
    module, _, _, params = load_for_eval(cfg, synthetic_init=True)
    batch = cfg.export.get("batch")
    manifest = export_encoders(
        module, params, str(cfg.export.dir),
        platforms=tuple(cfg.export.get("platforms", ("cpu", "tpu"))),
        batch=int(batch) if batch is not None else None,
        bake_weights=bool(cfg.export.get("bake_weights", True)),
        check=bool(cfg.export.get("check", True)))
    print(json.dumps({"export_dir": str(cfg.export.dir),
                      "embed_dim": manifest["embed_dim"],
                      "platforms": manifest["platforms"]}))
    return manifest


if __name__ == "__main__":
    main()
