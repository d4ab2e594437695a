"""Time the full-size MedMoE training step per MoE execution mode on the
current backend (single real TPU chip under the driver harness).

Reproduces the docs/PERFORMANCE.md "MoE mode step time" table: one full
Swin-T + 6-expert + BERT-tower step (fwd+bwd+Adam) at the reference per-chip
batch for each of ``moe_mode=gather`` (parity form, reference
swin.py:100-108 all-then-select semantics via embedding-gathered params) and
``moe_mode=topk`` (GShard-form capacity dispatch/combine einsums,
models/moe.py apply_dispatched — the EP execution form, run here unsharded).

Usage: python scripts/bench_moe_modes.py [batch] [modes...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_mode(mode: str, batch_size: int) -> dict:
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_module, _synthetic_batch
    from medmoe_tpu.train.state import TrainState
    from medmoe_tpu.train.step import build_train_step

    module, cfg = _flagship_module(experiment="pretraining_medmoe")
    if mode != cfg.model.model.vision.moe_mode:
        from medmoe_tpu.config import compose
        from medmoe_tpu.utils import instantiate

        cfg = compose("train", ["experiment=pretraining_medmoe",
                                f"model.model.vision.moe_mode={mode}"])
        module = instantiate(cfg.model)
    vision = cfg.model.model.vision
    text = cfg.model.model.text
    batch = _synthetic_batch(batch_size, int(vision.image_size),
                             int(text.max_length), 1000)
    batch = jax.device_put(batch)
    params = jax.jit(module.init_params)(jax.random.PRNGKey(0), batch)
    tx = module.make_optimizer(gradient_clip_val=0.25)
    state = TrainState.create(params, tx)
    step = build_train_step(module, mesh=None, accum_steps=1, donate=True)

    rng = jax.random.PRNGKey(1)
    for _ in range(2):                        # warmup (compile + first run)
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss in mode={mode}"

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
        float(metrics["loss"])                # forces chain completion
        best = min(best, (time.perf_counter() - t0) / 8)
    return {"mode": mode, "batch": batch_size,
            "step_ms": round(best * 1e3, 2),
            "pairs_per_sec": round(batch_size / best, 2)}


def main() -> None:
    args = sys.argv[1:]
    batch = int(args[0]) if args else 32
    modes = args[1:] or ["gather", "topk"]
    for mode in modes:
        print(json.dumps(time_mode(mode, batch)), flush=True)


if __name__ == "__main__":
    main()
