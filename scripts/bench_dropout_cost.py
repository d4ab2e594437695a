"""Itemize the HF-parity BERT train-dropout cost at B=32 (VERDICT round-3
directive #8): the round-3 parity change (dropout active on the frozen
tool-BERT in train mode, reference text_encoder.py:27-30 + Lightning
train()) moved the B=32 leg 525 → 510 pairs/s; this pins the with/without
delta as a single measured row for docs/PERFORMANCE.md.

Optionally sweeps the default PRNG impl (threefry vs rbg) to see how much
of the dropout cost is random-bit generation vs the masking itself.

Run on a real TPU:  python scripts/bench_dropout_cost.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(overrides, label, prng=None):
    import subprocess

    env = dict(os.environ, _DROPOUT_ARM=json.dumps(
        {"overrides": overrides, "label": label, "prng": prng}))
    out = subprocess.run([sys.executable, __file__], env=env,
                         capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("ARM_RESULT "):
            return json.loads(line[len("ARM_RESULT "):])
    print(out.stdout[-1500:], file=sys.stderr)
    print(out.stderr[-1500:], file=sys.stderr)
    raise SystemExit(f"arm {label} produced no result")


def run_arm(spec):
    if spec.get("prng"):
        import jax

        jax.config.update("jax_default_prng_impl", spec["prng"])
    from bench import _setup, measure_compute
    from medmoe_tpu.utils.task import enable_compile_cache

    enable_compile_cache()
    _, _, _, state, step, batch, gb, n_chips = _setup(
        overrides=spec["overrides"])
    pairs, step_s, _ = measure_compute(state, step, batch, gb, n_chips)
    print("ARM_RESULT " + json.dumps(
        {"label": spec["label"], "pairs_per_sec_chip": round(pairs, 2),
         "step_ms": round(step_s * 1e3, 2)}))


def main():
    if os.environ.get("_DROPOUT_ARM"):
        run_arm(json.loads(os.environ["_DROPOUT_ARM"]))
        return

    off = ["model.model.text.hidden_dropout_prob=0.0",
           "model.model.text.attention_probs_dropout_prob=0.0"]
    rows = [
        measure([], "dropout ON (HF parity, threefry PRNG — flagship)"),
        measure(off, "dropout OFF"),
        measure([], "dropout ON, rbg PRNG", prng="rbg"),
    ]
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
