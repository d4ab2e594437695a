"""A/B: Pallas vs XLA GLoRIA-local backward — is the 3.5% grad delta
training-neutral? (VERDICT round-3 directive #5.)

The Pallas backward kernels differentiate the bf16-rounded-input function
the forward actually evaluates, while the XLA remat differentiates the f32
function; on TPU the grads differ by ~3.5% max-rel at the B=256 regime
(docs/PERFORMANCE.md "GLoRIA local loss at the DDP-parity batch").  This
script runs the SAME overfit training run twice — identical seed, data,
and init, monolithic global-negative batch where the auto-select actually
picks the kernel — switching only MEDMOE_GLORIA_BWD, and prints both loss
curves. If they track within run-to-run noise, the grad delta is
training-neutral.

Run on a real TPU:  python scripts/ab_gloria_bwd.py [--steps 40] [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(bwd: str, steps: int, batch: int) -> list:
    os.environ["MEDMOE_GLORIA_IMPL"] = "pallas"   # force the kernel path
    os.environ["MEDMOE_GLORIA_BWD"] = bwd
    import jax

    from medmoe_tpu.utils.task import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship_module, _synthetic_batch
    from medmoe_tpu.train.state import TrainState
    from medmoe_tpu.train.step import build_train_step

    module, cfg = _flagship_module(
        "full", extra_overrides=["model.loss.global_negatives=true"])
    vision, text = cfg.model.model.vision, cfg.model.model.text
    data = _synthetic_batch(batch, int(vision.image_size),
                            int(text.max_length), 1000)
    data = jax.device_put(data)
    params = jax.jit(module.init_params)(jax.random.PRNGKey(0), data)
    tx = module.make_optimizer(gradient_clip_val=0.25)
    state = TrainState.create(params, tx)
    step = build_train_step(module, accum_steps=1, donate=True)

    losses = []
    rng = jax.random.PRNGKey(1)
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, data, sub)
        losses.append(float(metrics["loss"]))
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    # each arm in a fresh process: backend/env cleanliness
    if os.environ.get("_AB_ARM"):
        losses = run_arm(os.environ["_AB_ARM"], args.steps, args.batch)
        print("ARM_RESULT " + json.dumps(losses))
        return

    import subprocess

    curves = {}
    for arm in ("pallas", "xla"):
        env = dict(os.environ, _AB_ARM=arm)
        out = subprocess.run([sys.executable, __file__,
                              "--steps", str(args.steps),
                              "--batch", str(args.batch)],
                             env=env, capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("ARM_RESULT "):
                curves[arm] = json.loads(line[len("ARM_RESULT "):])
        if arm not in curves:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"arm {arm} produced no result")

    p, x = np.array(curves["pallas"]), np.array(curves["xla"])
    # relative divergence over the tail (post-transient) of the curves
    tail = slice(len(p) // 2, None)
    rel = np.abs(p - x) / np.maximum(np.abs(x), 1e-6)
    print(json.dumps({
        "steps": args.steps, "batch": args.batch,
        "pallas_first_last": [p[0], p[-1]],
        "xla_first_last": [x[0], x[-1]],
        "max_rel_divergence": float(rel.max()),
        "tail_mean_rel_divergence": float(rel[tail].mean()),
        "pallas_curve": curves["pallas"],
        "xla_curve": curves["xla"],
    }))


if __name__ == "__main__":
    main()
