"""Per-dataset shard-builder recipes (reference scripts/*_webdataset.py).

Each recipe must reproduce the reference script's annotation parsing, image
path construction, label derivation, and sample expansion: chexpert/chestxray/
radimagenet write one sample PER caption template from single-quoted JSON-list
csv fields (reference chexpert_webdataset.py:18-37,
radimagenet_webdataset.py:17-43), roco buckets images into split dirs by ID
substring (roco_webdataset.py:16-22), pmcoa reads jsonl
(pmcoa_webdataset.py:15-41), quilt skips unreadable rows
(quilt_webdataset.py:17-37).
"""

import csv
import io
import json
import os
import tarfile

import numpy as np
import pytest


def _write_jpeg(path):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.random.RandomState(0).rand(24, 24, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path, format="JPEG")


def _read_shards(pattern_dir):
    samples = {}
    for name in sorted(os.listdir(pattern_dir)):
        if not name.endswith(".tar"):
            continue
        with tarfile.open(os.path.join(pattern_dir, name)) as tar:
            for m in tar.getmembers():
                key, ext = m.name.rsplit(".", 1)
                samples.setdefault(key, {})[ext] = tar.extractfile(m).read()
    return samples


@pytest.fixture()
def build():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "build_webdataset",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "build_webdataset.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestChexpertRecipe:
    def _annotations(self, tmp_path, n=3, n_caps=2):
        root = tmp_path / "data"
        rows = []
        for i in range(n):
            rel = f"CheXpert-v1.0-small/train/patient{i}/view1.jpg"
            _write_jpeg(str(root / rel))
            caps = [f"finding {i} template {j} " for j in range(n_caps)]
            # reference csvs store python-repr lists (single quotes)
            rows.append({"filename": str([rel]), "captions": str(caps)})
        ann = tmp_path / "chexpert.csv"
        with open(ann, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "captions"])
            w.writeheader()
            w.writerows(rows)
        return str(ann), str(root)

    def test_expand_one_sample_per_template(self, tmp_path, build):
        ann, root = self._annotations(tmp_path)
        out = tmp_path / "shards"
        stats = build.build("chexpert", ann, root,
                            str(out / "d-%06d.tar"), verbose=False)
        assert stats == {"written": 6, "skipped": 0, "shards": 1}
        samples = _read_shards(str(out))
        # reference key scheme {idx:08d}_{l:08d}, cls 0, stripped captions
        assert set(samples) == {f"{i:08d}_{j:08d}"
                                for i in range(3) for j in range(2)}
        s = samples["00000001_00000001"]
        assert s["txt"].decode() == "finding 1 template 1"
        assert s["cls"].decode() == "0"
        # same image bytes repeated across the expansion
        assert s["jpg"] == samples["00000001_00000000"]["jpg"]

    def test_join_mode_single_sample_with_separator(self, tmp_path, build):
        from medmoe_tpu.data.templates import sample_caption

        ann, root = self._annotations(tmp_path)
        out = tmp_path / "shards"
        stats = build.build("chexpert", ann, root,
                            str(out / "d-%06d.tar"), mode="join",
                            verbose=False)
        assert stats["written"] == 3
        samples = _read_shards(str(out))
        txt = samples["00000001"]["txt"].decode()
        assert "_chexpert_" in txt
        # load-time sampling recovers one of the original templates
        assert sample_caption(txt) in txt.split("_chexpert_")

    def test_missing_image_skipped(self, tmp_path, build):
        ann, root = self._annotations(tmp_path, n=2)
        # corrupt one row's path
        rows = list(csv.DictReader(open(ann)))
        rows[0]["filename"] = str(["nope/missing.jpg"])
        with open(ann, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "captions"])
            w.writeheader()
            w.writerows(rows)
        stats = build.build("chexpert", ann, root,
                            str(tmp_path / "s" / "d-%06d.tar"),
                            verbose=False)
        assert stats["skipped"] == 1 and stats["written"] == 2


class TestRadimagenetRecipe:
    def test_modality_label_from_path(self, tmp_path, build):
        root = tmp_path / "data"
        rows = []
        for i, mod in enumerate(["CT", "MR", "UT"]):
            rel = f"radiology_ai/{mod}/img{i}.jpg"
            _write_jpeg(str(root / rel))
            rows.append({"filename": str([rel]),
                         "captions": str([f"a {mod} scan"])})
        ann = tmp_path / "radimagenet.csv"
        with open(ann, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "captions"])
            w.writeheader()
            w.writerows(rows)
        out = tmp_path / "shards"
        build.build("radimagenet", ann, str(root),
                    str(out / "d-%06d.tar"), verbose=False)
        samples = _read_shards(str(out))
        # reference label space: CT→1, MR→2, UT→3; key width 2
        labels = {k: v["cls"].decode() for k, v in samples.items()}
        assert labels == {"00000000_00": "1", "00000001_00": "2",
                          "00000002_00": "3"}


class TestRocoRecipe:
    def test_split_dir_from_id(self, tmp_path, build):
        root = tmp_path / "roco"
        rows = []
        for i, split in enumerate(["train", "valid", "test"]):
            img_id = f"ROCOv2_{split}_{i:06d}"
            _write_jpeg(str(root / split / (img_id + ".jpg")))
            rows.append({"ID": img_id, "caption": f" caption {i} ",
                         "label": str(i)})
        ann = tmp_path / "roco_data.csv"
        with open(ann, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["ID", "caption", "label"])
            w.writeheader()
            w.writerows(rows)
        out = tmp_path / "shards"
        stats = build.build("roco", ann, str(root),
                            str(out / "d-%06d.tar"), verbose=False)
        assert stats == {"written": 3, "skipped": 0, "shards": 1}
        samples = _read_shards(str(out))
        assert samples["00000002"]["cls"].decode() == "2"
        assert samples["00000000"]["txt"].decode() == "caption 0"


class TestPmcoaRecipe:
    def test_jsonl(self, tmp_path, build):
        root = tmp_path / "pmc"
        sub = "caption_T060_filtered_top4_sep_v0_subfigures"
        _write_jpeg(str(root / sub / "fig1.jpg"))
        ann = tmp_path / "pmcoa.jsonl"
        with open(ann, "w") as f:
            f.write(json.dumps({"image": "fig1.jpg",
                                "caption": "histology slide",
                                "pmcoa_label": 4}) + "\n")
        out = tmp_path / "shards"
        stats = build.build("pmcoa", str(ann), str(root),
                            str(out / "d-%06d.tar"), verbose=False)
        assert stats["written"] == 1
        samples = _read_shards(str(out))
        assert samples["00000000"]["cls"].decode() == "4"


class TestQuiltRecipe:
    def test_bad_rows_skipped(self, tmp_path, build):
        root = tmp_path / "q"
        _write_jpeg(str(root / "quilt_1m" / "ok.jpg"))
        ann = tmp_path / "quilt_labeled.csv"
        with open(ann, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["image_path", "caption",
                                              "label"])
            w.writeheader()
            w.writerows([
                {"image_path": "ok.jpg", "caption": "tissue", "label": "4"},
                {"image_path": "missing.jpg", "caption": "x", "label": "4"},
            ])
        stats = build.build("quilt", str(ann), str(root),
                            str(tmp_path / "s" / "d-%06d.tar"),
                            verbose=False)
        assert stats == {"written": 1, "skipped": 1, "shards": 1}


class TestPipelineCompat:
    def test_expanded_shards_feed_unimed_datamodule(self, tmp_path, build):
        """Shards written by the chexpert recipe stream through the actual
        training datamodule (decode → tokenize → collate)."""
        import glob

        from medmoe_tpu.data.datamodules import UnimedDataModule

        ann_dir = tmp_path
        tc = TestChexpertRecipe()
        ann, root = tc._annotations(ann_dir, n=4, n_caps=2)
        out = tmp_path / "shards"
        build.build("chexpert", ann, root, str(out / "d-%06d.tar"),
                    verbose=False)
        urls = "::".join(sorted(glob.glob(str(out / "*.tar"))))
        dm = UnimedDataModule(train_data_paths=urls, batch_size=4,
                              image_size=32, max_length=8, resampled=False,
                              shuffle_buffer=0, num_workers=0)
        batch = next(iter(dm.train_dataloader(0)))
        assert batch["image"].shape == (4, 32, 32, 3)
        assert batch["input_ids"].shape == (4, 8)
        assert batch["label"].shape == (4,)
