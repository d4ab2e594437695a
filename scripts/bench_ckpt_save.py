"""Measure the checkpoint save stall at full size: blocking vs async.

VERDICT round-4 directive #7's measurement: build the flagship train state
(122M params + Adam moments) on the real device, then time

  * ``blocking=True``  — the old path: ``StandardCheckpointer.save`` +
    ``wait_until_finished`` inline. The whole wall time stalls the epoch
    loop.
  * ``blocking=False`` — orbax ``AsyncCheckpointer``: the call returns
    after the device→host copy; serialization + disk write ride a
    background thread. The CALL latency is what the epoch loop now pays;
    the background remainder is timed separately via ``finalize_saves``.

Also restores both checkpoints and asserts leaf-exact equality (the
restore-equivalence check is unit-tested at small size in
tests/test_checkpoint.py::TestAsyncSave; this repeats it at full size).

Usage:  python scripts/bench_ckpt_save.py [workdir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_module, _synthetic_batch
    from medmoe_tpu.train.state import TrainState
    from medmoe_tpu.utils.checkpoint import (finalize_saves, restore_checkpoint,
                                             save_checkpoint)

    module, cfg = _flagship_module("full")
    vision = cfg.model.model.vision
    text = cfg.model.model.text
    batch = _synthetic_batch(8, int(vision.image_size),
                             int(text.max_length), 1000)
    params = jax.jit(module.init_params)(jax.random.PRNGKey(0), batch)
    tx = module.make_optimizer(gradient_clip_val=0.25)
    state = TrainState.create(params, tx)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params)
                   if hasattr(p, "shape"))
    nbytes = sum(p.nbytes for p in jax.tree_util.tree_leaves(
        {"p": state.params, "o": state.opt_state}) if hasattr(p, "nbytes"))

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="medmoe_ckpt_bench_")
    os.makedirs(root, exist_ok=True)
    out = {"n_params": n_params, "state_mb": round(nbytes / 1e6, 1)}
    try:
        # warm orbax's lazy imports/registries on a throwaway tiny save so
        # the timed legs measure I/O, not import time
        import optax

        warm = TrainState.create({"w": jax.numpy.ones((4,))}, optax.sgd(1e-3))
        save_checkpoint(os.path.join(root, "warm"), warm, blocking=True)
        save_checkpoint(os.path.join(root, "warm_a"), warm, blocking=False)

        for leg in ("blocking", "async"):
            times = []
            for i in range(3):
                path = os.path.join(root, f"{leg}_{i}")
                t0 = time.perf_counter()
                save_checkpoint(path, state, blocking=(leg == "blocking"))
                call = time.perf_counter() - t0
                t1 = time.perf_counter()
                finalize_saves()
                drain = time.perf_counter() - t1
                times.append((call, drain))
                if i < 2:
                    shutil.rmtree(path, ignore_errors=True)
            call = min(t[0] for t in times)
            out[f"{leg}_call_s"] = round(call, 2)
            if leg == "async":
                out["async_background_s"] = round(
                    min(t[1] for t in times), 2)

        # full-size restore equivalence blocking vs async
        fresh = TrainState.create(
            jax.tree_util.tree_map(jax.numpy.zeros_like, params), tx)
        r_b = restore_checkpoint(os.path.join(root, "blocking_2"), fresh)
        r_a = restore_checkpoint(os.path.join(root, "async_2"), fresh)
        for a, b in zip(jax.tree_util.tree_leaves(r_b.params),
                        jax.tree_util.tree_leaves(r_a.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out["restore_equal"] = True
        out["stall_saved_s"] = round(
            out["blocking_call_s"] - out["async_call_s"], 2)
    finally:
        if len(sys.argv) <= 1:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
