"""Attribute measure_e2e's per-batch wall time to its phases.

Replicates bench.measure_e2e's structure EXACTLY (same shards, same
datamodule, same prefetch(loader, 2, put)) but times, per iteration:

  * q_wait   — main-thread time blocked waiting on the prefetch queue
               (producer-limited time: decode thread + put thread)
  * dispatch — time to dispatch the jitted step (async; should be ~0)
  * fence    — only at the end, as measure_e2e does

If sum(q_wait) ~ 0, the producer keeps up and e2e is device-limited;
if q_wait dominates, the put/decode chain is the bottleneck and its
measured stage times (scripts/probe_transfer_overlap.py) say which.

Run on the real chip: python scripts/probe_e2e_attrib.py
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

    import bench
    from medmoe_tpu.data.datamodules import UnimedDataModule
    from medmoe_tpu.data.prefetch import prefetch
    from medmoe_tpu.parallel.sharding import batch_sharding

    module, cfg, mesh, state, step, batch, gb, n_chips = bench._setup()
    # warm the uint8 step variant the e2e leg runs (normalize-on-device)
    steps = int(os.environ.get("MEDMOE_BENCH_E2E_STEPS", "12"))
    warmup = 2
    vision = cfg.model.model.vision
    root = tempfile.mkdtemp(prefix="medmoe_probe_")
    try:
        urls = bench._write_bench_shards(
            root, (steps + warmup + 1) * gb, int(vision.image_size))
        dm = UnimedDataModule(
            train_data_paths=urls, batch_size=gb,
            image_size=int(vision.image_size),
            max_length=int(cfg.model.model.text.max_length),
            resampled=False, shuffle_buffer=0, num_workers=4,
            emit_uint8=True)
        sharding = batch_sharding(mesh) if mesh is not None else None
        put = (lambda b: jax.device_put(b, sharding)) \
            if sharding is not None else jax.device_put
        rng = jax.random.PRNGKey(2)
        q_wait, disp = [], []
        t0 = None
        n_done = 0
        it = prefetch(dm.train_dataloader(0), 2, put)
        t_iter = time.perf_counter()
        for i in range(warmup + steps):
            tq = time.perf_counter()
            dev = next(it)
            tg = time.perf_counter()
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, dev, sub)
            td = time.perf_counter()
            if i + 1 == warmup:
                float(metrics["loss"])
                t0 = time.perf_counter()
            elif i >= warmup:
                q_wait.append(tg - tq)
                disp.append(td - tg)
                n_done += 1
        float(metrics["loss"])
        total = time.perf_counter() - t0
        per = total / n_done
        print(json.dumps({
            "global_batch": gb,
            "pairs_per_sec": round(gb / per / n_chips, 2),
            "ms_per_batch": round(per * 1e3, 1),
            "q_wait_ms": round(sum(q_wait) / n_done * 1e3, 1),
            "dispatch_ms": round(sum(disp) / n_done * 1e3, 1),
            "device_residual_ms": round(
                (per - sum(q_wait) / n_done - sum(disp) / n_done) * 1e3, 1),
            "q_wait_each": [round(v * 1e3) for v in q_wait],
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
