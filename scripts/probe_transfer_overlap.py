"""Does host→device transfer overlap device compute on this harness?

VERDICT round-4 weak #1 asked for an overlap attribution: e2e (123.9
pairs/s in r04) sat BELOW even the no-overlap sum of its stage ceilings,
so either prefetch's device_put-on-a-worker-thread overlap is broken, or
this tunnel serializes transfers with execution. This probe measures the
primitive directly, with no data pipeline in the way:

  A. transfer-only:  device_put(batch) + on-device touch, value-fetched
  B. step-only:      train step on a device-resident batch
  C. serialized:     put(i) then step(i), back to back
  D. overlapped:     a worker thread issues put(i+1) AND FORCES it with a
                     value fetch while step(i) runs

overlap efficiency = C_time / D_time (2.0 = perfect, 1.0 = none).

MEASURED (round 5, one v5e, B=32 / 4.83 MB): A=130.6 ms (37.0 MB/s),
B=97.3 ms, C=127.2 ms ≈ max(A, B) — async dispatch pipelines the next
transfer under the in-flight step with no thread needed — and D=233.4 ms
≈ A+B: the forcing fetch serializes with execution on this tunnel. Note
D is NOT data/prefetch.prefetch's structure (prefetch's transform never
forces); the real-pipeline A/B (scripts/ab_e2e_put.py) shows the shipped
worker-thread put beats inline put (304.7 vs 250.9 pairs/s best).
Prints one JSON line. Run on the real chip: python scripts/probe_transfer_overlap.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_module, _synthetic_batch
    from medmoe_tpu.train.state import TrainState
    from medmoe_tpu.train.step import build_train_step

    module, cfg = _flagship_module("full")
    vision = cfg.model.model.vision
    text = cfg.model.model.text
    B = int(os.environ.get("MEDMOE_PROBE_BATCH", "32"))
    host_batches = []
    for seed in range(4):
        b = _synthetic_batch(B, int(vision.image_size), int(text.max_length),
                             1000, seed=seed)
        b["image"] = (np.clip(b["image"], -2.5, 2.5) * 50 + 128) \
            .astype(np.uint8)
        host_batches.append(b)
    nbytes = sum(v.nbytes for v in host_batches[0].values())

    params = jax.jit(module.init_params)(
        jax.random.PRNGKey(0), host_batches[0])
    tx = module.make_optimizer(gradient_clip_val=0.25)
    state = TrainState.create(params, tx)
    step = build_train_step(module, mesh=None, accum_steps=1, donate=False)
    touch = jax.jit(lambda b: sum(jnp.sum(v.astype(jnp.float32))
                                  for v in b.values()))
    rng = jax.random.PRNGKey(1)

    # warm every compiled program
    dev0 = jax.device_put(host_batches[0])
    float(touch(dev0))
    state, m = step(state, dev0, rng)
    float(m["loss"])

    def timeit(fn, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # A: transfer-only (touch forces materialization; its compute is ~0)
    t_put = timeit(lambda: float(touch(jax.device_put(host_batches[1]))))

    # B: step-only, device-resident input
    def run_step():
        nonlocal state
        state, met = step(state, dev0, rng)
        float(met["loss"])
    t_step = timeit(run_step)

    # C: serialized put→step, 4 iterations per rep
    def serialized():
        nonlocal state
        for i in range(4):
            d = jax.device_put(host_batches[i % 4])
            state, met = step(state, d, rng)
        float(met["loss"])
    t_ser = timeit(serialized, reps=3) / 4

    # D: overlapped — worker thread device_puts batch i+1 during step i
    def overlapped():
        nonlocal state
        slot = {}

        def put(i):
            slot[i] = jax.device_put(host_batches[i % 4])
            float(touch(slot[i]))     # force the copy to complete on the
                                      # worker, as prefetch's transform does
        put(0)
        for i in range(4):
            th = threading.Thread(target=put, args=(i + 1,))
            th.start()
            state, met = step(state, slot.pop(i), rng)
            float(met["loss"])        # fence step i before joining put i+1
            th.join()
        float(met["loss"])
    t_ovl = timeit(overlapped, reps=3) / 4

    print(json.dumps({
        "batch": B,
        "mb_per_batch": round(nbytes / 1e6, 2),
        "transfer_ms": round(t_put * 1e3, 1),
        "transfer_mb_s": round(nbytes / t_put / 1e6, 1),
        "step_ms": round(t_step * 1e3, 1),
        "serialized_ms": round(t_ser * 1e3, 1),
        "overlapped_ms": round(t_ovl * 1e3, 1),
        "overlap_efficiency": round(t_ser / t_ovl, 2),
        "perfect_overlap_ms": round(max(t_put, t_step) * 1e3, 1),
        "no_overlap_ms": round((t_put + t_step) * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
