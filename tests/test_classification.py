"""Supervised classification path: CheXpert-style CSV data + linear probe
module through the full train CLI."""

import csv
import io
import os

import numpy as np
import pytest


def _make_chexpert_fixture(root):
    from PIL import Image

    os.makedirs(os.path.join(root, "p"), exist_ok=True)
    rows = []
    rng = np.random.RandomState(0)
    tasks = ["Atelectasis", "Cardiomegaly", "Consolidation", "Edema",
             "Pleural Effusion"]
    for i in range(12):
        rel = f"p/img{i}.jpg"
        Image.fromarray((rng.rand(48, 40, 3) * 255).astype(np.uint8)).save(
            os.path.join(root, rel), format="JPEG")
        row = {"Path": f"CheXpert-v1.0/{rel}",
               "Frontal/Lateral": "Frontal"}
        for t in tasks:
            row[t] = str(float(rng.randint(-1, 2)))   # incl. uncertain -1
        rows.append(row)
    for name in ("train.csv", "valid.csv"):
        with open(os.path.join(root, name), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            for r in rows:
                w.writerow(r)
    return root


class TestCheXpertData:
    def test_uncertain_mapping_and_shapes(self, tmp_path):
        from medmoe_tpu.data.datamodules import CheXpertDataModule

        root = _make_chexpert_fixture(str(tmp_path))
        dm = CheXpertDataModule(data_dir=root, batch_size=4, image_size=32)
        batch = next(iter(dm.test_dataloader()))
        assert batch["image"].shape == (4, 32, 32, 3)
        assert batch["label"].shape == (4, 5)
        # uncertain labels mapped per CheXpert paper (no -1 survives)
        assert (batch["label"] >= 0).all()

    def test_fraction_sampling(self, tmp_path):
        from medmoe_tpu.data.datamodules import CheXpertDataModule

        root = _make_chexpert_fixture(str(tmp_path))
        dm = CheXpertDataModule(data_dir=root, batch_size=64, image_size=32,
                                fraction=0.5)
        rows = dm._rows("train")
        assert len(rows) == 6


class TestClassificationCLI:
    @pytest.mark.slow
    def test_linear_probe_training(self, tmp_path):
        from medmoe_tpu.cli.train import main

        root = _make_chexpert_fixture(str(tmp_path / "chex"))
        metrics = main([
            "experiment=pretraining_medmoe",
            "model=classification", "data=chexpert",
            f"data.data_dir={root}", "data.batch_size=4",
            "data.image_size=56",
            "model.model.vision.image_size=56",
            "model.model.vision.swin_embed_dim=8",
            "model.model.vision.swin_depths=[1,1]",
            "model.model.vision.swin_num_heads=[1,2]",
            "model.model.vision.use_moe=false",
            "model.model.vision.dtype=float32",
            "model.num_classes=5", "model.multilabel=true",
            "trainer.accelerator=cpu", "trainer.devices=1",
            "trainer.max_epochs=2", "trainer.accumulate_grad_batches=2",
            "trainer.num_sanity_val_steps=0",
            f"paths.root_dir={tmp_path}",
        ])
        assert "train/acc" in metrics
        assert 0.0 <= metrics["train/acc"] <= 1.0
        assert np.isfinite(metrics["train/loss"])
