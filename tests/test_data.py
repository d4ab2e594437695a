"""Data pipeline tests: shard writer↔reader round trip, URL expansion,
template sampling, datamodule batches, transforms."""

import io
import os

import numpy as np
import pytest

from medmoe_tpu.data.shards import (WebDatasetReader, braceexpand,
                                    expand_urls, group_by_keys, ShardList)
from medmoe_tpu.data.shard_writer import ShardWriter
from medmoe_tpu.data.templates import sample_caption
from medmoe_tpu.data.transforms import normalize, resize_pad


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class TestUrls:
    def test_braceexpand(self):
        assert braceexpand("d-{001..003}.tar") == [
            "d-001.tar", "d-002.tar", "d-003.tar"]
        assert braceexpand("plain.tar") == ["plain.tar"]

    def test_multisource_with_weights(self):
        urls, weights = expand_urls("a-{01..02}.tar::b.tar", "2.0::1.0")
        assert urls == ["a-01.tar", "a-02.tar", "b.tar"]
        assert weights == [2.0, 2.0, 1.0]

    def test_weight_mismatch_raises(self):
        with pytest.raises(ValueError):
            expand_urls("a.tar::b.tar", "1.0")


class TestShardRoundTrip:
    def test_write_read(self, tmp_path):
        pattern = str(tmp_path / "shard-%06d.tar")
        rng = np.random.RandomState(0)
        with ShardWriter(pattern, maxcount=4) as w:
            for i in range(10):
                img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
                w.write({"__key__": f"{i:04d}", "jpg": _png_bytes(img),
                         "txt": f"caption {i}", "cls": i % 3})
        # 10 samples, 4/shard → 3 shards + sizes.json sidecar
        shards = sorted(f for f in os.listdir(tmp_path) if f.endswith(".tar"))
        assert len(shards) == 3
        import json

        with open(tmp_path / "sizes.json") as f:
            sizes = json.load(f)
        assert sizes == {"shard-000000.tar": 4, "shard-000001.tar": 4,
                         "shard-000002.tar": 2}
        from medmoe_tpu.data.shards import discover_num_samples

        assert discover_num_samples(
            str(tmp_path / "shard-{000000..000002}.tar")) == 10

        reader = WebDatasetReader(str(tmp_path / "shard-{000000..000002}.tar"))
        samples = list(reader.samples(epoch=0))
        assert len(samples) == 10
        keys = sorted(s["__key__"].decode() for s in samples)
        assert keys == [f"{i:04d}" for i in range(10)]
        s0 = next(s for s in samples if s["__key__"] == b"0000")
        assert s0["txt"] == b"caption 0"
        assert s0["cls"] == b"0"

    def test_corrupt_shard_skipped(self, tmp_path):
        good = str(tmp_path / "shard-000000.tar")
        with ShardWriter(good) as w:
            w.write({"__key__": "a", "txt": "hello"})
        bad = tmp_path / "shard-000001.tar"
        bad.write_bytes(b"this is not a tar file at all" * 10)
        reader = WebDatasetReader(str(tmp_path / "shard-{000000..000001}.tar"))
        samples = list(reader.samples(0))
        assert len(samples) == 1          # nothrow: bad shard silently skipped


class TestShardScheduling:
    def test_epoch_shuffle_deterministic(self):
        urls = [f"s{i}.tar" for i in range(10)]
        sl = ShardList(urls, seed=7)
        e0a, e0b = sl.for_epoch(0), sl.for_epoch(0)
        assert e0a == e0b                          # same epoch → same order
        assert sorted(e0a) == sorted(urls)
        assert sl.for_epoch(1) != e0a              # epochs differ

    def test_split_by_process_and_worker_partitions(self):
        urls = [f"s{i}.tar" for i in range(16)]
        parts = []
        for p in range(2):
            for w in range(2):
                sl = ShardList(urls, seed=3, num_processes=2,
                               process_index=p, num_workers=2,
                               worker_index=w)
                parts.append(sl.for_epoch(0))
        flat = [u for part in parts for u in part]
        assert sorted(flat) == sorted(urls)        # exact partition
        assert len(set(flat)) == 16

    def test_resampled_respects_weights(self):
        sl = ShardList("a.tar::b.tar", weights="100.0::1.0", resampled=True,
                       seed=0)
        picks = []
        for e in range(50):
            picks.extend(sl.for_epoch(e))
        assert picks.count("a.tar") > picks.count("b.tar") * 5


class TestGroupByKeys:
    def test_duplicate_key_tolerated(self):
        members = [("a.jpg", b"1"), ("a.txt", b"t"),
                   ("a.jpg", b"dup"),           # duplicate ext → new sample
                   ("b.jpg", b"2"), ("b.txt", b"u")]
        samples = list(group_by_keys(iter(members)))
        assert len(samples) == 3


class TestTemplates:
    def test_radimagenet_picks_one(self):
        import random

        text = "cap one_radimagenet_cap two_radimagenet_cap three"
        picks = {sample_caption(text, random.Random(s)) for s in range(20)}
        assert picks <= {"cap one", "cap two", "cap three"}
        assert len(picks) > 1

    def test_openi_pins_original(self):
        text = "original_openi_t1_openi_t2_openi_t3"
        assert sample_caption(text) == "original"

    def test_mimiccxr_prefers_caption(self):
        assert sample_caption("t1_mimiccxr_t2_mimiccxr_real report") == \
            "real report"
        import random

        out = sample_caption("t1_mimiccxr_t2_mimiccxr_noreportpresent",
                             random.Random(0))
        assert out in ("t1", "t2")

    def test_plain_passthrough(self):
        assert sample_caption("just a caption") == "just a caption"


class TestTransforms:
    def test_resize_pad_aspect(self):
        img = np.full((100, 50, 3), 255, np.uint8)
        out = resize_pad(img, 64)
        assert out.shape == (64, 64, 3)
        # horizontally padded: left and right columns black
        assert out[:, 0].max() == 0 and out[:, -1].max() == 0
        assert out[32, 32].max() > 0

    def test_normalize_stats(self):
        img = np.full((4, 4, 3), 128, np.uint8)
        out = normalize(img, "half")
        # f32 cancellation near zero → loose rtol
        np.testing.assert_allclose(out, (128 / 255 - 0.5) / 0.5, rtol=1e-3)


class TestDataModules:
    def test_synthetic_batches(self):
        from medmoe_tpu.data.datamodules import SyntheticDataModule

        dm = SyntheticDataModule(num_samples=8, batch_size=4, image_size=32,
                                 max_length=12)
        batches = list(dm.train_dataloader(0))
        assert len(batches) == 2
        b = batches[0]
        assert b["image"].shape == (4, 32, 32, 3)
        assert b["input_ids"].shape == (4, 12)
        assert b["cap_lens"].shape == (4,)
        assert b["label"].dtype == np.int32

    def test_unimed_from_written_shards(self, tmp_path):
        from medmoe_tpu.data.datamodules import UnimedDataModule

        rng = np.random.RandomState(0)
        pattern = str(tmp_path / "d-%06d.tar")
        with ShardWriter(pattern, maxcount=8) as w:
            for i in range(16):
                img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
                w.write({"__key__": f"{i:05d}", "jpg": _png_bytes(img),
                         "txt": f"caption number {i}_radimagenet_alt {i}",
                         "cls": i % 6})
        dm = UnimedDataModule(
            train_data_paths=str(tmp_path / "d-{000000..000001}.tar"),
            val_data_paths=str(tmp_path / "d-000000.tar"),
            batch_size=4, image_size=32, max_length=12, resampled=False,
            shuffle_buffer=8)
        batches = list(dm.train_dataloader(0))
        assert len(batches) == 4
        assert batches[0]["image"].shape == (4, 32, 32, 3)
        assert set(batches[0].keys()) >= {"input_ids", "cap_lens", "label"}
        # labels must be the cls field
        all_labels = np.concatenate([b["label"] for b in batches])
        assert set(all_labels.tolist()) <= set(range(6))

    def test_unimed_parallel_decode_matches_serial(self, tmp_path):
        """num_workers>0 routes through the thread-pool chunk decoder
        (reference: 5-worker DataLoader) — same samples, same order."""
        from medmoe_tpu.data.datamodules import UnimedDataModule

        rng = np.random.RandomState(1)
        pattern = str(tmp_path / "w-%06d.tar")
        with ShardWriter(pattern, maxcount=8) as w:
            for i in range(12):
                img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
                w.write({"__key__": f"{i:05d}", "jpg": _png_bytes(img),
                         "txt": f"plain caption {i}", "cls": i % 6})
        kw = dict(train_data_paths=str(tmp_path / "w-{000000..000001}.tar"),
                  batch_size=4, image_size=32, max_length=12,
                  resampled=False, shuffle_buffer=0)
        serial = list(UnimedDataModule(num_workers=0, **kw)
                      .train_dataloader(0))
        pooled = list(UnimedDataModule(num_workers=3, **kw)
                      .train_dataloader(0))
        assert len(serial) == len(pooled) == 3
        for a, b in zip(serial, pooled):
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["label"], b["label"])


class TestMasking:
    def test_beit_block_masking(self):
        from medmoe_tpu.data.masking import ImageMaskingGenerator

        gen = ImageMaskingGenerator(14, num_masking_patches=75, seed=0)
        mask = gen()
        assert mask.shape == (14, 14)
        assert 0 < mask.sum() <= 75 + 16     # blocks may overshoot slightly
        gen2 = ImageMaskingGenerator(14, num_masking_patches=75, seed=0)
        np.testing.assert_array_equal(mask, gen2())   # seeded determinism


class TestCsvDataModule:
    def test_csv_pairs(self, tmp_path):
        import csv as csvmod

        from medmoe_tpu.data.datamodules import CsvDataModule
        from PIL import Image

        rng = np.random.RandomState(0)
        rows = []
        for i in range(6):
            rel = f"im{i}.jpg"
            Image.fromarray((rng.rand(20, 20, 3) * 255).astype(np.uint8)
                            ).save(str(tmp_path / rel))
            rows.append({"filepath": rel, "title": f"caption {i}",
                         "cls": i % 2})
        with open(tmp_path / "data.csv", "w", newline="") as f:
            w = csvmod.DictWriter(f, fieldnames=["filepath", "title", "cls"])
            w.writeheader()
            [w.writerow(r) for r in rows]
        dm = CsvDataModule(data_dir=str(tmp_path),
                           csv_path=str(tmp_path / "data.csv"),
                           batch_size=3, image_size=16, max_length=8)
        batch = next(iter(dm.train_dataloader(0)))
        assert batch["image"].shape == (3, 16, 16, 3)
        assert dm.steps_per_epoch == 2
        # train rows are epoch-shuffled (fresh in-batch negatives per epoch):
        # full-epoch label multiset is preserved, determinism per (seed,epoch)
        def epoch_labels(epoch):
            return [lab for b in dm.train_dataloader(epoch)
                    for lab in b["label"].tolist()]

        assert sorted(epoch_labels(0)) == [0, 0, 0, 1, 1, 1]
        assert epoch_labels(0) == epoch_labels(0)
        assert any(epoch_labels(e) != epoch_labels(0) for e in range(1, 6))
        # val keeps file order
        vbatch = next(iter(dm.val_dataloader()))
        assert vbatch["label"].tolist() == [0, 1, 0]
        assert dm.val_steps_per_epoch == 2


class TestUint8Shipping:
    def test_synthetic_emits_float_but_uint8_via_transform(self):
        from medmoe_tpu.data.transforms import ImageTransform

        t = ImageTransform(16, normalize_output=False)
        img = (np.random.RandomState(0).rand(32, 24, 3) * 255).astype(
            np.uint8)
        out = t(img)
        assert out.dtype == np.uint8
        assert out.shape == (16, 16, 3)

    def test_device_normalize_matches_host(self):
        import jax
        import jax.numpy as jnp

        from medmoe_tpu.config import DotDict
        from medmoe_tpu.data.transforms import normalize
        from medmoe_tpu.models.medmoe import MedMoE
        from tests.helpers import tiny_text, tiny_vision

        model = MedMoE(vision=tiny_vision(), text=tiny_text())
        img = (np.random.RandomState(0).rand(2, 8, 8, 3) * 255).astype(
            np.uint8)
        on_device = model._maybe_normalize(jnp.asarray(img))
        host = normalize(img, "imagenet")
        np.testing.assert_allclose(np.asarray(on_device), host, rtol=1e-5,
                                   atol=1e-6)
        # float input passes through untouched
        f32 = host.astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(model._maybe_normalize(jnp.asarray(f32))), f32)
