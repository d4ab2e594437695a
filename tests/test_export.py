"""StableHLO serving export (medmoe_tpu/eval/export.py + cli/export.py):
artifact files + manifest, built-in live-module parity check, and the
shape-polymorphic batch dimension."""

import json
import os

import numpy as np
import pytest

TINY = [
    "data=synthetic", "data.batch_size=4", "data.num_samples=8",
    "data.image_size=56",
    "model.model.vision.image_size=56",
    "model.model.vision.swin_embed_dim=8",
    "model.model.vision.swin_depths=[1,1]",
    "model.model.vision.swin_num_heads=[1,2]",
    "model.model.vision.num_experts=3",
    "model.model.vision.embed_dim=16",
    "model.model.vision.dtype=float32",
    "model.model.text.hidden_size=16",
    "model.model.text.num_layers=2",
    "model.model.text.num_heads=2",
    "model.model.text.intermediate_size=32",
    "model.model.text.vocab_size=64",
    "model.model.text.embed_dim=16",
    "model.model.text.max_length=10",
    "model.model.text.dtype=float32",
]


class TestExportCLI:
    def test_export_roundtrip_and_polymorphic_batch(self, tmp_path, capsys):
        from medmoe_tpu.cli.export import main

        out = tmp_path / "artifacts"
        manifest = main(TINY + [f"export.dir={out}",
                                "export.platforms=[cpu]",
                                f"paths.root_dir={tmp_path}"])
        # the built-in check=True already asserted live-module parity
        assert (out / "encode_image.jaxexport").exists()
        assert (out / "encode_text.jaxexport").exists()
        disk = json.loads((out / "manifest.json").read_text())
        assert disk["embed_dim"] == manifest["embed_dim"] > 0
        assert disk["platforms"] == ["cpu"]
        printed = [l for l in capsys.readouterr().out.splitlines()
                   if l.startswith("{")]
        assert json.loads(printed[-1])["embed_dim"] == disk["embed_dim"]

        # the symbolic batch dim must accept arbitrary wave sizes
        from jax import export as jexport

        art = jexport.deserialize(
            (out / "encode_image.jaxexport").read_bytes())
        rng = np.random.RandomState(1)
        for b in (1, 2, 5):
            emb = np.asarray(art.call(
                rng.rand(b, 56, 56, 3).astype(np.float32)))
            assert emb.shape == (b, disk["embed_dim"])
            np.testing.assert_allclose(np.linalg.norm(emb, axis=-1),
                                       1.0, rtol=1e-5)
        # different inputs → different embeddings (artifact isn't constant)
        e2 = np.asarray(art.call(rng.rand(2, 56, 56, 3)
                                 .astype(np.float32)))
        assert not np.allclose(e2[0], e2[1])

    def test_multi_platform_default(self, tmp_path):
        """The default platforms=[cpu,tpu] lowers both variants from a
        CPU-only process (lowering is rule-based, no TPU needed) and the
        artifact still executes on the host platform."""
        from medmoe_tpu.cli.export import main

        out = tmp_path / "multi"
        manifest = main(TINY + [f"export.dir={out}",
                                f"paths.root_dir={tmp_path}"])
        assert manifest["platforms"] == ["cpu", "tpu"]
        from jax import export as jexport

        art = jexport.deserialize(
            (out / "encode_image.jaxexport").read_bytes())
        assert tuple(art.platforms) == ("cpu", "tpu")
        emb = np.asarray(art.call(np.zeros((2, 56, 56, 3), np.float32)))
        assert emb.shape == (2, manifest["embed_dim"])

    def test_static_batch_export(self, tmp_path):
        from medmoe_tpu.cli.export import main

        out = tmp_path / "static"
        main(TINY + [f"export.dir={out}", "export.platforms=[cpu]",
                     "export.batch=3", f"paths.root_dir={tmp_path}"])
        from jax import export as jexport

        art = jexport.deserialize(
            (out / "encode_image.jaxexport").read_bytes())
        ok = np.asarray(art.call(np.zeros((3, 56, 56, 3), np.float32)))
        assert ok.shape[0] == 3
        with pytest.raises(Exception):
            art.call(np.zeros((4, 56, 56, 3), np.float32))

    def test_unbaked_weights_mode(self, tmp_path):
        """bake_weights=false: ~MB program + weights.npz; call_exported
        reassembles the tree and matches the baked artifact exactly."""
        from medmoe_tpu.cli.export import main
        from medmoe_tpu.eval.export import call_exported, load_weights

        baked = tmp_path / "baked"
        unbaked = tmp_path / "unbaked"
        main(TINY + [f"export.dir={baked}", "export.platforms=[cpu]",
                     f"paths.root_dir={tmp_path}"])
        main(TINY + [f"export.dir={unbaked}", "export.platforms=[cpu]",
                     "export.bake_weights=false",
                     f"paths.root_dir={tmp_path}"])
        assert (unbaked / "weights.npz").exists()
        # weights moved out of the StableHLO constants: the program must
        # shrink (at tiny shapes only by the small param bytes; at full
        # size 146 MB → ~2 MB — measured, docs/PERFORMANCE.md)
        assert ((unbaked / "encode_image.jaxexport").stat().st_size
                < (baked / "encode_image.jaxexport").stat().st_size)
        assert (unbaked / "weights.npz").stat().st_size > 10_000
        w = load_weights(str(unbaked))
        assert isinstance(w, dict) and w     # nested, non-empty

        rng = np.random.RandomState(2)
        images = rng.rand(3, 56, 56, 3).astype(np.float32)
        got_b = np.asarray(call_exported(str(baked), "image")(images))
        got_u = np.asarray(call_exported(str(unbaked), "image")(images))
        # baked constants let XLA fold/reassociate slightly differently —
        # ~1e-7, not bit-exact
        np.testing.assert_allclose(got_b, got_u, atol=1e-6)

        # a baked RE-export into the unbaked dir must remove the stale
        # weights.npz (call_exported would otherwise prepend a weights
        # tree to a program that doesn't take one)
        main(TINY + [f"export.dir={unbaked}", "export.platforms=[cpu]",
                     f"paths.root_dir={tmp_path}"])
        assert not (unbaked / "weights.npz").exists()
        rebaked = np.asarray(call_exported(str(unbaked), "image")(images))
        np.testing.assert_allclose(rebaked, got_b, atol=1e-6)

    def test_expert_impl_env_restored(self, tmp_path, monkeypatch):
        """export forces MEDMOE_EXPERT_IMPL=xla during lowering but must
        restore the caller's value."""
        from medmoe_tpu.cli.export import main

        monkeypatch.setenv("MEDMOE_EXPERT_IMPL", "pallas")
        main(TINY + [f"export.dir={tmp_path / 'e'}",
                     "export.platforms=[cpu]",
                     f"paths.root_dir={tmp_path}"])
        assert os.environ["MEDMOE_EXPERT_IMPL"] == "pallas"
