"""Component-inventory tests: FLAVA losses, collectives, LoRA, ResNet,
generic transformer stack, classifier heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P


class TestCollectives:
    def _run(self, backprop):
        from jax.sharding import Mesh

        from medmoe_tpu.parallel.collectives import (BackpropType,
                                                     gather_tensor)

        mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
        x = jnp.arange(8.0).reshape(8, 1)

        def f(x):
            g = gather_tensor(x, "data", backprop)
            return jnp.sum(g * g)

        fn = jax.shard_map(lambda x: jax.grad(f)(x), mesh=mesh,
                           in_specs=P("data"), out_specs=P("data"))
        return np.asarray(fn(x))

    def test_global_backprop_full_grad(self):
        from medmoe_tpu.parallel.collectives import BackpropType

        g = self._run(BackpropType.GLOBAL)
        # every shard's grad = d/dx sum over ALL devices of its own gathered
        # copies: 4 devices each contribute 2x → 8x
        np.testing.assert_allclose(g, 8.0 * np.arange(8).reshape(8, 1))

    def test_local_backprop_partial_grad(self):
        from medmoe_tpu.parallel.collectives import BackpropType

        g = self._run(BackpropType.LOCAL)
        np.testing.assert_allclose(g, 2.0 * np.arange(8).reshape(8, 1))

    def test_none_backprop_zero_grad(self):
        from medmoe_tpu.parallel.collectives import BackpropType

        g = self._run(BackpropType.NONE)
        np.testing.assert_allclose(g, 0.0)

    def test_gather_values(self):
        from jax.sharding import Mesh

        from medmoe_tpu.parallel.collectives import (BackpropType,
                                                     gather_tensor)

        mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
        x = jnp.arange(8.0).reshape(8, 1)
        out = jax.shard_map(
            lambda v: gather_tensor(v, "data", BackpropType.GLOBAL),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
            check_vma=False)(x)
        np.testing.assert_allclose(np.asarray(out),
                                   np.arange(8.0).reshape(8, 1))


class TestFlavaLosses:
    def test_itm_loss(self):
        from medmoe_tpu.ops.flava import ITMLoss

        m = ITMLoss(hidden_size=8)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 5, 8), jnp.float32)
        labels = jnp.asarray([0, 1, -1, 1])
        v = m.init(jax.random.PRNGKey(0), x, labels)
        out = m.apply(v, x, labels)
        assert out.logits.shape == (4, 2)
        assert np.isfinite(float(out.loss))

    def test_masked_prediction_ignore_index(self):
        from medmoe_tpu.ops.flava import MaskedPredictionLoss

        m = MaskedPredictionLoss(hidden_size=8, vocab_size=11)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 8), jnp.float32)
        labels = jnp.asarray([[1, -1, -1, 3, -1, -1], [-1] * 6])
        v = m.init(jax.random.PRNGKey(0), x, labels)
        out = m.apply(v, x, labels)
        assert np.isfinite(float(out.loss))
        # all-ignored second row contributes nothing; loss = mean over the
        # two valid positions
        logits = np.asarray(out.logits[0])
        lp = logits - np.log(np.exp(logits
                                    - logits.max(-1, keepdims=True))
                             .sum(-1, keepdims=True)) \
            - logits.max(-1, keepdims=True)
        expected = -(lp[0, 1] + lp[3, 3]) / 2
        np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)

    def test_flava_global_contrastive(self):
        from medmoe_tpu.ops.flava import FLAVAGlobalContrastiveLoss

        m = FLAVAGlobalContrastiveLoss()
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randn(6, 8), jnp.float32)
        txt = jnp.asarray(rng.randn(6, 8), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), img, txt)
        out = m.apply(v, img, txt)
        assert np.isfinite(float(out.loss))
        np.testing.assert_allclose(float(out.logit_scale),
                                   np.log(1 / 0.07), rtol=1e-5)
        # aligned pairs score lower loss
        out2 = m.apply(v, img, img)
        assert float(out2.loss) < float(out.loss)

    def test_flava_pretraining_composite(self):
        from medmoe_tpu.ops.flava import FLAVAPretrainingLoss

        m = FLAVAPretrainingLoss(hidden_size=8, text_vocab_size=11,
                                 image_vocab_size=13)
        rng = np.random.RandomState(0)
        kwargs = dict(
            image_sequence=jnp.asarray(rng.randn(4, 8), jnp.float32),
            text_sequence=jnp.asarray(rng.randn(4, 8), jnp.float32),
            text_masked_sequence=jnp.asarray(rng.randn(4, 6, 8), jnp.float32),
            mlm_labels=jnp.asarray(rng.randint(-1, 11, (4, 6))),
            multimodal_masked_sequence=jnp.asarray(rng.randn(4, 6, 8),
                                                   jnp.float32),
            itm_labels=jnp.asarray([0, 1, 0, 1]),
        )
        v = m.init(jax.random.PRNGKey(0), **kwargs)
        out = m.apply(v, **kwargs)
        assert {"mlm_loss", "itm_loss", "global_contrastive_loss",
                "loss"} <= set(out)
        assert np.isfinite(float(out["loss"]))


class TestLoRA:
    def test_linear_zero_init_is_identity(self):
        from medmoe_tpu.models.lora import LoRALinear

        m = LoRALinear(6, r=2, alpha=4)
        x = jnp.asarray(np.random.RandomState(0).randn(3, 5), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        base_only = m.apply(v, x)
        # lora_b zero-init → adapter contributes nothing at init
        v0 = jax.tree_util.tree_map(np.asarray, v)
        assert np.allclose(v0["params"]["lora_b"], 0.0)
        plain = x @ v0["params"]["base"]["kernel"] + v0["params"]["base"]["bias"]
        np.testing.assert_allclose(np.asarray(base_only), plain, rtol=1e-5)

    def test_merge_lora_matches_unmerged(self):
        from medmoe_tpu.models.lora import LoRALinear, merge_lora

        m = LoRALinear(6, r=2, alpha=4)
        x = jnp.asarray(np.random.RandomState(1).randn(3, 5), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(np.asarray, v["params"])
        params["lora_b"] = np.random.RandomState(2).randn(2, 6).astype(
            np.float32)
        live = m.apply({"params": params}, x)
        merged = merge_lora(params, alpha_over_r=4 / 2)
        plain = x @ merged["base"]["kernel"] + merged["base"]["bias"]
        np.testing.assert_allclose(np.asarray(live), np.asarray(plain),
                                   rtol=1e-4, atol=1e-5)
        assert "lora_a" not in merged

    def test_merge_lora_embedding(self):
        from medmoe_tpu.models.lora import LoRAEmbedding, merge_lora

        m = LoRAEmbedding(num_embeddings=11, features=6, r=3, alpha=6)
        ids = jnp.asarray([[0, 4, 10], [2, 2, 7]], jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        params = jax.tree_util.tree_map(np.asarray, v["params"])
        # lora_a zero-init: randomize so the merge is load-bearing
        params["lora_a"] = np.random.RandomState(3).randn(11, 3).astype(
            np.float32)
        live = m.apply({"params": params}, ids)
        merged = merge_lora(params, alpha_over_r=6 / 3)
        assert "lora_a" not in merged and "lora_b" not in merged
        folded = np.asarray(merged["base"]["embedding"])[np.asarray(ids)]
        np.testing.assert_allclose(np.asarray(live), folded,
                                   rtol=1e-4, atol=1e-5)

    def test_merge_lora_requires_scale(self):
        import pytest

        from medmoe_tpu.models.lora import LoRALinear, merge_lora

        m = LoRALinear(6, r=2, alpha=4)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 5)))
        with pytest.raises(ValueError, match="alpha_over_r"):
            merge_lora(jax.tree_util.tree_map(np.asarray, v["params"]))

    def test_merge_lora_leaves_merged_linear_intact(self):
        from medmoe_tpu.models.lora import LoRAMergedLinear, merge_lora

        m = LoRAMergedLinear(12, enable_lora=(True, False, True), r=2)
        x = jnp.ones((2, 5))
        v = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(np.asarray, v["params"])
        merged = merge_lora(params, alpha_over_r=1.0)
        # block-structured factors are not foldable from params alone —
        # they must survive so module application stays correct
        assert "lora_a" in merged and "lora_b" in merged
        np.testing.assert_allclose(np.asarray(m.apply({"params": merged}, x)),
                                   np.asarray(m.apply({"params": params}, x)))

    def test_param_mask(self):
        from medmoe_tpu.models.lora import LoRALinear, lora_param_mask

        m = LoRALinear(6, r=2)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 5)))
        mask = lora_param_mask(v["params"])
        assert mask["lora_a"] is True and mask["lora_b"] is True
        assert mask["base"]["kernel"] is False


class TestResNet:
    def test_resnet18_shapes(self):
        from medmoe_tpu.models.resnet import ResNet18

        m = ResNet18(norm="group")
        x = np.zeros((2, 64, 64, 3), np.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        g, local = jax.jit(m.apply)(v, x)
        assert g.shape == (2, 512)
        assert local.shape == (2, 256, 4, 4)   # layer3 @ 64/16

    def test_vision_tower_resnet_path(self):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.models.vision_encoder import ImageEncoder

        cfg = DotDict(dict(model_name="resnet_18", lora=False, norm="group",
                           use_moe=False, embed_dim=512))
        m = ImageEncoder(cfg)
        x = np.zeros((1, 64, 64, 3), np.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        g, local, router = jax.jit(m.apply)(v, x)
        assert g.shape == (1, 512)
        assert local.shape[1] == 256           # channel-first local map
        assert router is None


class TestBackboneFactory:
    """The full factory surface of reference cnn_backbones.py:19-100."""

    def test_factory_dims(self):
        from medmoe_tpu.models.cnn_backbones import BACKBONES

        # (feature_dim, interm) per the reference factory's return values
        expect = {
            "resnet_18": (512, 256), "resnet_34": (512, 256),
            "resnet_50": (2048, 1024), "resnet_101": (2048, 1024),
            "resnet_152": (2048, 1024),
            "densenet_121": (1024, None), "densenet_161": (2208, None),
            "densenet_169": (1664, None),
            "resnext_50": (2048, None), "resnext_100": (2048, None),
            "swin": (768, 768),
        }
        assert set(BACKBONES) == set(expect)
        for name, (dim, interm) in expect.items():
            if name == "swin":
                continue   # swin builds the full backbone; covered elsewhere
            model, feature_dim, got_interm = BACKBONES[name](norm="group")
            assert feature_dim == dim, name
            assert got_interm == interm, name

    def test_densenet_backbone_shapes(self):
        from medmoe_tpu.models.densenet import DenseNet121

        m = DenseNet121(norm="group")
        x = np.zeros((1, 64, 64, 3), np.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        g, local = jax.jit(m.apply)(v, x)
        assert g.shape == (1, 1024)      # torchvision classifier.in_features
        assert local.shape == (1, 1024, 4, 4)   # stage-3 map @ 64/16

    def test_densenet161_group_norm_composes(self):
        """DenseNet-161's growth-48 widths (144, 240, …) are NOT multiples
        of 32 — the group-norm option must adapt its group count
        (gcd(32, C), resnet._norm) instead of crashing on the second dense
        layer of block 1. eval_shape traces every norm without FLOPs."""
        from medmoe_tpu.models.densenet import DenseNet161

        m = DenseNet161(norm="group")
        x = np.zeros((1, 64, 64, 3), np.float32)
        v = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
        g, local = jax.eval_shape(
            lambda vv, xx: m.apply(vv, xx), v, x)
        assert g.shape == (1, 2208)      # torchvision densenet161 dim
        assert local.shape == (1, 2112, 4, 4)

    def test_resnext_backbone_shapes(self):
        from medmoe_tpu.models.resnet import ResNeXt50

        m = ResNeXt50(norm="group")
        x = np.zeros((1, 64, 64, 3), np.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        g, local = jax.jit(m.apply)(v, x)
        assert g.shape == (1, 2048)
        assert local.shape == (1, 1024, 4, 4)
        # grouped 3x3: kernel in-channel dim is width/groups, and the stage-1
        # bottleneck width doubles vs plain resnet50 (32 groups x 4 width)
        k = v["params"]["layer1_block0"]["conv2"]["kernel"]
        assert k.shape == (3, 3, 128 // 32, 128)

    def test_facade_densenet_dispatch(self):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.models.vision_encoder import ImageEncoder

        cfg = DotDict(dict(model_name="densenet_121", norm="group",
                           use_moe=False))
        m = ImageEncoder(cfg)
        x = np.zeros((1, 64, 64, 3), np.float32)
        v = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
        assert "densenet" in v["params"]

    def test_facade_resnext_dispatch(self):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.models.vision_encoder import ImageEncoder

        cfg = DotDict(dict(model_name="resnext_50", lora=False, norm="group",
                           use_moe=False))
        m = ImageEncoder(cfg)
        x = np.zeros((1, 64, 64, 3), np.float32)
        v = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
        params = v["params"]["resnet"]["model"]
        # resnext width: stage-1 grouped conv kernel has 4 in-channels/group
        k = params["layer1_block0"]["conv2"]["kernel"]
        assert k.shape == (3, 3, 4, 128)


class TestTransformerStack:
    def test_encoder_shapes(self):
        from medmoe_tpu.models.transformer import TransformerEncoder

        m = TransformerEncoder(num_layers=2, dim=8, num_heads=2)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.last_hidden_state.shape == (2, 5, 8)
        assert len(out.hidden_states) == 3

    def test_flava_transformer_cls(self):
        from medmoe_tpu.models.transformer import \
            FLAVATransformerWithoutEmbeddings

        m = FLAVATransformerWithoutEmbeddings(num_layers=1, dim=8,
                                              num_heads=2)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.last_hidden_state.shape == (2, 6, 8)   # CLS prepended
        assert out.pooler_output.shape == (2, 8)

    def test_decoder_cache_matches_full(self):
        """Decoding one token at a time through the kv-cache must equal the
        full causal forward."""
        from medmoe_tpu.models.transformer import TransformerDecoder

        dim, t = 8, 4
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, t, dim), jnp.float32)
        mem = jnp.asarray(rng.randn(1, 3, dim), jnp.float32)

        full = TransformerDecoder(num_layers=1, dim=dim, num_heads=2,
                                  use_cache=False)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        v = full.init(jax.random.PRNGKey(0), x, mem, self_mask=causal)
        ref = full.apply(v, x, mem, self_mask=causal)

        dec = TransformerDecoder(num_layers=1, dim=dim, num_heads=2,
                                 use_cache=True, max_cache_length=t)
        vc = dec.init(jax.random.PRNGKey(0), x[:, :1], mem,
                      decode_step=jnp.asarray(0))
        vc = {"params": v["params"], "cache": vc["cache"]}
        outs = []
        cache = vc["cache"]
        for i in range(t):
            y, mut = dec.apply({"params": v["params"], "cache": cache},
                               x[:, i:i + 1], mem,
                               decode_step=jnp.asarray(i),
                               mutable=["cache"])
            cache = mut["cache"]
            outs.append(np.asarray(y)[:, 0])
        got = np.stack(outs, axis=1)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4,
                                   atol=1e-5)

    def test_shift_dim(self):
        from medmoe_tpu.models.transformer import shift_dim

        x = jnp.zeros((2, 3, 4, 5))
        assert shift_dim(x, 1, -1).shape == (2, 4, 5, 3)
        assert shift_dim(x, -1, 1).shape == (2, 5, 3, 4)


class TestHeads:
    def test_pretrained_classifier_frozen(self):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.models.heads import PretrainedImageClassifier
        from medmoe_tpu.models.vision_encoder import ImageEncoder

        enc = ImageEncoder(DotDict(dict(
            model_name="swin", use_moe=False, embed_dim=16, image_size=56,
            swin_embed_dim=8, swin_depths=[1, 1], swin_num_heads=[1, 2],
            drop_path_rate=0.0, dtype="float32")))
        m = PretrainedImageClassifier(enc, num_classes=5)
        x = np.random.RandomState(0).randn(2, 56, 56, 3).astype(np.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        logits = jax.jit(m.apply)(v, x)
        assert logits.shape == (2, 5)

        def loss(params):
            return jnp.sum(m.apply({"params": params}, x) ** 2)

        grads = jax.jit(jax.grad(loss))(v["params"])
        enc_grads = jax.tree_util.tree_leaves(grads["encoder"])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in enc_grads)
        head_grads = jax.tree_util.tree_leaves(grads["head"])
        assert any(float(jnp.abs(g).max()) > 0.0 for g in head_grads)


class TestLoRAMultiheadAttention:
    def test_shapes_and_adapter_masking(self):
        from medmoe_tpu.models.lora import (LoRAMultiheadAttention,
                                            lora_param_mask)

        m = LoRAMultiheadAttention(dim=8, num_heads=2, r=2)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 5, 8)
        # LoRA only on q/v/out (reference default), not k
        mask = lora_param_mask(v["params"])
        assert "lora_a" in v["params"]["q_proj"]
        assert "lora_a" not in v["params"]["k_proj"]
        assert mask["q_proj"]["lora_a"] is True


class TestSoftXEntPenalty:
    def test_penalty_weighting(self):
        from medmoe_tpu.ops.losses import soft_xent, soft_xent_penalty

        rng = np.random.RandomState(0)
        target = np.eye(4, dtype=np.float32)
        logits = jnp.asarray(rng.randn(4, 4), jnp.float32)
        ones = jnp.ones((4, 4), jnp.float32)
        np.testing.assert_allclose(
            float(soft_xent_penalty(jnp.asarray(target), logits, ones)),
            float(soft_xent(jnp.asarray(target), logits)), rtol=1e-6)
        halved = float(soft_xent_penalty(jnp.asarray(target), logits,
                                         ones * 0.5))
        assert abs(halved * 2 - float(soft_xent(jnp.asarray(target),
                                                logits))) < 1e-5
