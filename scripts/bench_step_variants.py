"""Measured probes at the B=32 flagship step (round-4 directive #3: attack
the non-matmul time). Arms run in fresh subprocesses on the real TPU:

  * allbf16    — ALL params stored bf16 (upper bound for the "bf16 params +
                 f32 master copy" design: if even this doesn't move the step,
                 the master-copy machinery can't either; not a valid training
                 config by itself — probe only).
  * bertbf16   — only the FROZEN BERT subtree stored bf16 (valid config:
                 frozen params need no master copy; halves the text tower's
                 param reads).
  * nogradnorm — optimizer update without the grad_norm metric (checks XLA
                 CSEs the metric's square-sums with optax's global-norm clip).
  * vmem<N>    — --xla_tpu_scoped_vmem_limit_kib=<N> compiler probe.

Usage: python scripts/bench_step_variants.py [arm ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = ["allbf16", "bertbf16", "nogradnorm", "vmem131072", "baseline"]

# round-5 arms (both measured NEUTRAL → shipped defaults unchanged,
# docs/PERFORMANCE.md round-5): lncompact — compact-residual custom_vjp LN
# (MEDMOE_LN_IMPL=compact, models/layers.py); experthkeep — expert backward
# keeps h in VMEM instead of recomputing h_pre (MEDMOE_EXPERT_BWD_HKEEP=1)
ARMS += ["lncompact", "experthkeep"]


def _cast_tree(tree, dtype):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype")
        and jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def run_arm(arm: str):
    if arm.startswith("vmem"):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_tpu_scoped_vmem_limit_kib={arm[4:]}")
    if arm == "lncompact":
        os.environ["MEDMOE_LN_IMPL"] = "compact"
    if arm == "experthkeep":
        os.environ["MEDMOE_EXPERT_BWD_HKEEP"] = "1"
    import jax
    import jax.numpy as jnp

    from bench import _setup, measure_compute
    from medmoe_tpu.utils.task import enable_compile_cache

    enable_compile_cache()
    module, cfg, mesh, state, step, batch, gb, n = _setup(batch=32, accum=1)

    if arm == "allbf16":
        params = _cast_tree(state.params, jnp.bfloat16)
        tx = module.make_optimizer(gradient_clip_val=0.25)
        from medmoe_tpu.train.state import TrainState

        state = TrainState.create(jax.device_put(params), tx)
    elif arm == "bertbf16":
        params = dict(state.params)
        te = dict(params["text_encoder"])
        te["bert"] = _cast_tree(te["bert"], jnp.bfloat16)
        params["text_encoder"] = te
        tx = module.make_optimizer(gradient_clip_val=0.25)
        from medmoe_tpu.train.state import TrainState

        state = TrainState.create(jax.device_put(params), tx)
    elif arm == "nogradnorm":
        from medmoe_tpu.train.state import TrainState

        def loss_for(params, b, rng, tool):
            kw = {"tool_params": tool} if module.uses_tool_bert else {}
            return module.loss_fn(params, b, deterministic=False,
                                  rngs={"dropout": rng}, **kw)

        grad_fn = jax.grad(loss_for, has_aux=True)

        def bare_step(state, b, rng, tool):
            grads, metrics = grad_fn(state.params, b, rng, tool)
            return state.apply_gradients(grads), metrics

        jitted = jax.jit(bare_step, donate_argnums=(0,))

        def step(state, b, rng):          # noqa: F811 — same call surface
            return jitted(state, b, rng,
                          getattr(module, "tool_bert_params", None))

    pairs, step_s, _ = measure_compute(state, step, batch, gb, n)
    print("ARM_RESULT " + json.dumps(
        {"arm": arm, "pairs": round(pairs, 2),
         "step_ms": round(step_s * 1e3, 2)}))


def main():
    if os.environ.get("_VARIANT_ARM"):
        run_arm(os.environ["_VARIANT_ARM"])
        return
    arms = sys.argv[1:] or ARMS
    for arm in arms:
        out = subprocess.run([sys.executable, __file__],
                             env=dict(os.environ, _VARIANT_ARM=arm),
                             capture_output=True, text=True)
        hit = [ln for ln in out.stdout.splitlines()
               if ln.startswith("ARM_RESULT ")]
        if hit:
            print(hit[0], flush=True)
        else:
            print(f"arm {arm} FAILED", file=sys.stderr)
            print(out.stdout[-1200:], file=sys.stderr)
            print(out.stderr[-1200:], file=sys.stderr)


if __name__ == "__main__":
    main()
