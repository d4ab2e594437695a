"""A/B: where should device_put run in the e2e hot loop on this harness?

scripts/probe_transfer_overlap.py measured that a device_put issued from a
worker thread concurrently with an in-flight step SERIALIZES with it on
this tunnel (overlap_efficiency 0.55), while put→step issued back-to-back
from the main thread pipelines nearly perfectly (127 ms/iter ≈
max(transfer 131, step 97)). This A/B tests the consequence in the REAL
e2e pipeline (bench.measure_e2e's exact structure):

  A. worker-put  — prefetch(loader, 2, put): decode AND device_put on the
                   worker thread (the round-4 shipped structure)
  B. inline-put  — prefetch(loader, 2): decode-only on the worker;
                   device_put inline on the main thread before the step
  C. inline-put, depth 3

Arms run interleaved (A B C A B C) in one process to control tunnel
drift, over the same pre-written shards. Prints one JSON line.
Run on the real chip: python scripts/ab_e2e_put.py
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
    steps = int(os.environ.get("MEDMOE_BENCH_E2E_STEPS", "10"))
    warmup = 2
    vision = cfg.model.model.vision
    sharding = batch_sharding(mesh) if mesh is not None else None
    put = (lambda b: jax.device_put(b, sharding)) \
        if sharding is not None else jax.device_put

    root = tempfile.mkdtemp(prefix="medmoe_ab_")
    try:
        urls = bench._write_bench_shards(
            root, (steps + warmup + 1) * gb, int(vision.image_size))

        def run(arm: str) -> float:
            nonlocal state
            dm = UnimedDataModule(
                train_data_paths=urls, batch_size=gb,
                image_size=int(vision.image_size),
                max_length=int(cfg.model.model.text.max_length),
                resampled=False, shuffle_buffer=0, num_workers=4,
                emit_uint8=True)
            rng = jax.random.PRNGKey(2)
            if arm == "worker-put":
                it = prefetch(dm.train_dataloader(0), 2, put)
                get = lambda: next(it)
            else:
                depth = 3 if arm.endswith("3") else 2
                it = prefetch(dm.train_dataloader(0), depth)
                get = lambda: put(next(it))
            t0 = None
            n_done = 0
            for i in range(warmup + steps):
                dev = get()
                rng, sub = jax.random.split(rng)
                state, metrics = step(state, dev, sub)
                if i + 1 == warmup:
                    float(metrics["loss"])
                    t0 = time.perf_counter()
                elif i >= warmup:
                    n_done += 1
            float(metrics["loss"])
            it.close()
            return gb / ((time.perf_counter() - t0) / n_done) / n_chips

    # interleaved reps to control tunnel drift
        arms = ["worker-put", "inline-put", "inline-put-3"]
        results = {a: [] for a in arms}
        for _ in range(2):
            for a in arms:
                results[a].append(round(run(a), 1))
        print(json.dumps({
            "global_batch": gb,
            "pairs_per_sec": results,
            "best": {a: max(v) for a, v in results.items()},
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
