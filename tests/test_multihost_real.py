"""REAL multi-process training — no monkeypatching.

The reference simulates multi-node DDP with Lightning's 2-process CPU
launcher (reference configs/trainer/ddp_sim.yaml); every other multi-host
test here stubs jax.process_count. This one actually launches TWO Python
processes joined by jax.distributed.initialize() over a localhost
coordinator (gloo CPU collectives, jaxlib's default), each owning 2 CPU
devices of a 4-device global mesh, and runs the full train CLI —
`Trainer.fit`, validation, the collective orbax checkpoint save — end to
end on both.

The headline assertion is topology equivalence: a 2-process × 2-device
run must produce the SAME per-epoch loss trajectory as a 1-process ×
4-device run with the same seed and the same global batch. The global
batches contain the same sample SETS in different row order (stride vs
contiguous split of the synthetic index space), and the default
experiment's global-negative contrastive losses are row-permutation
invariant — so any drift beyond float-reduction noise means the
per-process data split, make_array_from_process_local_data assembly, or
the gradient collectives are wrong.

Slow: two concurrent XLA compiles on this host (~3-5 min total).
"""

from __future__ import annotations

import csv
import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

# one tiny-tower config, expressed per-process: the 2-process run loads
# batch_size rows per process (global batch 2x), the solo run doubles
# batch_size instead — same 8-row global batch either way
TINY = [
    "experiment=pretraining_medmoe",
    "data=synthetic",
    "data.num_samples=16",
    "data.image_size=56",
    "data.num_classes=3",
    "model.model.vision.image_size=56",
    "model.model.vision.swin_embed_dim=8",
    "model.model.vision.swin_depths=[1,1]",
    "model.model.vision.swin_num_heads=[1,2]",
    "model.model.vision.num_experts=3",
    "model.model.vision.embed_dim=16",
    "model.model.vision.dtype=float32",
    "model.model.vision.drop_path_rate=0.0",
    "model.model.text.hidden_size=16",
    "model.model.text.num_layers=2",
    "model.model.text.num_heads=2",
    "model.model.text.intermediate_size=32",
    "model.model.text.vocab_size=64",
    "model.model.text.embed_dim=16",
    "model.model.text.max_length=10",
    "model.model.text.dtype=float32",
    "model.model.text.hidden_dropout_prob=0.0",
    "model.model.text.attention_probs_dropout_prob=0.0",
    "trainer.accelerator=cpu",
    "trainer.max_epochs=2",
    "trainer.num_sanity_val_steps=0",
    "trainer.log_every_n_steps=1",
    "logger=csv",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(extra):
    env = dict(os.environ)
    # subprocesses must not inherit this pytest process's platform pins;
    # the CLI pins cpu itself via trainer.accelerator (jax.config is
    # authoritative — this image's sitecustomize imports jax early)
    env.pop("XLA_FLAGS", None)
    env.update(extra)
    return env


def _run_cli(overrides, env_extra, timeout=600):
    cmd = [sys.executable, "-m", "medmoe_tpu.cli.train"] + overrides
    return subprocess.run(cmd, env=_env(env_extra), capture_output=True,
                          text=True, timeout=timeout)


def _epoch_rows(root) -> list:
    path = os.path.join(root, "logs", "train", "runs", "csv", "metrics.csv")
    assert os.path.exists(path), f"no metrics.csv under {root}"
    with open(path) as f:
        rows = [r for r in csv.DictReader(f) if r.get("train/loss")]
    assert rows, "csv has no epoch rows"
    return rows


def test_two_process_fit_matches_single_process(tmp_path):
    port = _free_port()
    root2 = tmp_path / "p2"
    # --- 2 processes x 2 local devices, per-process batch 4 ------------
    over2 = TINY + ["data.batch_size=4", "trainer.devices=2",
                    "trainer.num_nodes=2", f"paths.root_dir={root2}"]
    procs = [subprocess.Popen(
        [sys.executable, "-m", "medmoe_tpu.cli.train"] + over2,
        env=_env({"JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
                  "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(p)}),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for p in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert procs[0].returncode == 0, outs[0][-4000:]
    assert procs[1].returncode == 0, outs[1][-4000:]
    # both actually joined one 4-device runtime (framework logs are
    # rank-0-gated, so process 1 is identified by its orbax shard writes)
    assert "process 0 of 2, 2 local / 4 global devices" in outs[0]
    assert "[process=1] Started async saving checkpoint" in outs[1]

    # collective checkpoint: committed (tmp dir finalized) + exactly one
    # sidecar, written by process 0 only
    ckpt_dir = root2 / "logs" / "train" / "runs" / "checkpoints"
    assert (ckpt_dir / "last" / "_CHECKPOINT_METADATA").exists()
    assert (ckpt_dir / "last.meta.json").exists()
    assert not [p for p in os.listdir(ckpt_dir) if "tmp" in p]
    meta = json.loads((ckpt_dir / "last.meta.json").read_text())
    assert meta.get("epoch") == 1

    # --- 1 process x 4 devices, batch 8: same global batch -------------
    root1 = tmp_path / "p1"
    over1 = TINY + ["data.batch_size=8", "trainer.devices=4",
                    f"paths.root_dir={root1}"]
    solo = _run_cli(over1, {})
    assert solo.returncode == 0, (solo.stdout + solo.stderr)[-4000:]

    rows2, rows1 = _epoch_rows(root2), _epoch_rows(root1)
    assert len(rows2) == len(rows1) == 2
    for r2, r1 in zip(rows2, rows1):
        for key in ("train/loss", "train/g_loss", "train/l_loss",
                    "train/c_loss", "val/loss"):
            a, b = float(r2[key]), float(r1[key])
            assert a == pytest.approx(b, rel=2e-4), (
                f"{key}: 2-process {a} vs single-process {b} — the "
                f"multi-host data split / batch assembly / gradient "
                f"collectives diverge from single-host training")
