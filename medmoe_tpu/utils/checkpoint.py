"""Orbax-backed checkpointing of the train state + run metadata.

Replaces Lightning's .ckpt files (reference: ModelCheckpoint /
`trainer.fit(ckpt_path=...)` resume, src/train.py:90). Train state
(params + optimizer state + step) is one pytree; saves are atomic and
restore is shape-checked against an abstract target.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state: Any,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Save a TrainState pytree (rank 0 only) + sidecar metadata."""
    if jax.process_index() != 0:
        return
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    # tx is a static field; orbax saves the pytree leaves only
    ckpt.save(path, {"step": state.step, "params": state.params,
                     "opt_state": state.opt_state}, force=True)
    ckpt.wait_until_finished()
    if extra:
        with open(path + ".meta.json", "w") as f:
            json.dump({k: (float(v) if hasattr(v, "item") else v)
                       for k, v in extra.items()}, f)


def restore_checkpoint(path: str, state: Any) -> Any:
    """Restore into the structure of ``state`` (shapes/dtypes validated).

    Falls back to a params+step-only restore when the saved optimizer
    state's tree structure no longer matches the live optimizer (e.g. a
    checkpoint written before frozen-subtree masking — optax.masked drops
    the frozen params' Adam moments, changing the opt_state pytree). The
    fallback resumes with FRESH optimizer moments (Adam re-warms within
    ~100 steps) instead of refusing the checkpoint outright; a warning
    says so."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    target = {"step": state.step, "params": state.params,
              "opt_state": state.opt_state}
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(getattr(x, "shape", ()),
                                       getattr(x, "dtype", None),
                                       sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x, target)
    try:
        restored = ckpt.restore(path, abstract)
    except Exception as exc:
        from medmoe_tpu.utils.logging import get_logger

        get_logger(__name__).warning(
            f"full train-state restore failed ({type(exc).__name__}); "
            f"retrying params+step only — optimizer moments start FRESH "
            f"(expected for checkpoints saved under a different optimizer "
            f"structure, e.g. pre-frozen-masking): {exc}")
        params = load_params(path, state.params)
        # re-place on the live params' shardings (mesh runs restore into
        # sharded state; load_params lands on the default device)
        params = jax.tree_util.tree_map(
            lambda t, p: jax.device_put(p, t.sharding)
            if getattr(t, "sharding", None) is not None else p,
            state.params, params)
        import orbax.checkpoint as ocp

        raw = ocp.PyTreeCheckpointer().restore(path)
        step = int(raw.get("step", state.step))
        return state.replace(step=jax.numpy.asarray(
            step, dtype=getattr(state.step, "dtype", None)), params=params)
    return state.replace(step=restored["step"], params=restored["params"],
                         opt_state=restored["opt_state"])


def load_params(path: str, params_template: Optional[Any] = None) -> Any:
    """Restore only model parameters (for eval harnesses — no optimizer
    structure needed): raw-restores the saved tree and picks 'params'."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    raw = ocp.PyTreeCheckpointer().restore(path)
    params = raw.get("params", raw)
    if params_template is not None:
        params = jax.tree_util.tree_map(
            lambda t, p: jax.numpy.asarray(p, getattr(t, "dtype", None)),
            params_template, params)
    return params
