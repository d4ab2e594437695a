"""FULL-SIZE weight-conversion parity (VERDICT round-3 directive #1).

Every other torch-parity test runs tiny towers (2-layer/56-px). This one
runs the REAL checkpoint remap the 0.5% zero-shot gate depends on
(reference med_moe.py:40-62): a random-init full-size HF
``SwinModel(SwinConfig())`` — swin-tiny, depths (2,2,6,2), embed 96,
224 px, with downsample layers between stages and per-stage
relative-position-bias tables at heads (3,6,12,24) — plus a 12-layer
BERT-base ``BertModel``, saved as a MedCLIP-shaped ``pytorch_model.bin``,
loaded through ``load_medclip_checkpoint(strict=True)`` (every checkpoint
key must be consumed), then forward parity of our flax towers vs the HF
forwards on a real-resolution batch. No network: random init only.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VOCAB = 28996          # Bio_ClinicalBERT vocab (bert-base-cased)


@pytest.fixture(scope="module")
def fullsize_ckpt(tmp_path_factory):
    """MedCLIP-shaped checkpoint with FULL-SIZE towers (cf. the tiny
    builder in test_zero_shot_gate._medclip_checkpoint)."""
    from transformers import BertConfig, BertModel, SwinConfig, SwinModel

    torch.manual_seed(0)
    swin = SwinModel(SwinConfig(hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0,
                                drop_path_rate=0.0))    # swin-tiny defaults
    bert = BertModel(BertConfig(vocab_size=VOCAB, hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0,
                                output_hidden_states=True))  # bert-base
    swin.eval()
    bert.eval()
    sd = {}
    for k, v in swin.state_dict().items():
        sd[f"vision_model.{k}"] = v
    for k, v in bert.state_dict().items():
        sd[f"text_model.{k}"] = v
    path = tmp_path_factory.mktemp("medclip") / "pytorch_model.bin"
    torch.save(sd, str(path))
    return str(path), swin, bert


@pytest.mark.slow
class TestFullSizeConversion:
    def test_remap_consumes_every_key_and_towers_match_hf(self, fullsize_ckpt):
        import jax
        import jax.numpy as jnp

        from medmoe_tpu.models.bert import BertConfig, BertModel
        from medmoe_tpu.models.convert import load_medclip_checkpoint
        from medmoe_tpu.models.swin import SwinBackbone, SwinConfig

        ckpt_path, hf_swin, hf_bert = fullsize_ckpt

        # --- our full-size towers, f32 for a tight numeric gate ----------
        swin_cfg = SwinConfig(drop_path_rate=0.0, dtype=jnp.float32)
        assert swin_cfg.depths == (2, 2, 6, 2) and swin_cfg.embed_dim == 96
        swin = SwinBackbone(swin_cfg)
        bert_cfg = BertConfig(vocab_size=VOCAB, dtype=jnp.float32)
        assert bert_cfg.num_layers == 12 and bert_cfg.hidden_size == 768
        bert = BertModel(bert_cfg)

        rng = np.random.RandomState(0)
        x = rng.randn(2, 224, 224, 3).astype(np.float32)        # NHWC
        ids = rng.randint(0, VOCAB, size=(2, 25)).astype(np.int32)
        mask = np.ones((2, 25), np.int32)
        mask[1, 17:] = 0
        types = np.zeros((2, 25), np.int32)

        key = jax.random.PRNGKey(0)
        swin_params = jax.jit(swin.init)(key, x)["params"]
        bert_params = jax.jit(bert.init)(key, ids, mask, types)["params"]

        # --- the real remap path, full MedMoE-shaped tree, STRICT --------
        tree = {"image_encoder": {"swin_moe": {"swin": swin_params}},
                "text_encoder": {"bert": bert_params}}
        tree = load_medclip_checkpoint(tree, ckpt_path, strict=True)
        swin_params = tree["image_encoder"]["swin_moe"]["swin"]
        bert_params = tree["text_encoder"]["bert"]

        # weights actually landed (not just "no error"): patch embedding
        # kernel equals the HF projection, transposed to NHWC layout
        np.testing.assert_array_equal(
            np.asarray(swin_params["patch_embed"]["proj"]["kernel"]),
            hf_swin.state_dict()[
                "embeddings.patch_embeddings.projection.weight"]
            .numpy().transpose(2, 3, 1, 0))

        # --- forward parity vs HF on the same batch ----------------------
        with torch.no_grad():
            hf_out = hf_swin(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             output_hidden_states=True)
        pyramid, final = jax.jit(swin.apply)({"params": swin_params}, x)
        # all four pyramid stages: stage transitions (downsample layers)
        # and every rel-pos-bias table are on this path
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(pyramid[i]), hf_out.hidden_states[i].numpy(),
                rtol=1e-3, atol=1e-4,
                err_msg=f"swin pyramid stage {i}")
        np.testing.assert_allclose(
            np.asarray(final), hf_out.last_hidden_state.numpy(),
            rtol=1e-3, atol=1e-4, err_msg="swin final hidden")

        with torch.no_grad():
            bert_out = hf_bert(torch.from_numpy(ids).long(),
                               torch.from_numpy(mask).long(),
                               torch.from_numpy(types).long(),
                               output_hidden_states=True)
        last, pooled, hidden = jax.jit(bert.apply)(
            {"params": bert_params}, ids, mask, types)
        np.testing.assert_allclose(np.asarray(last),
                                   bert_out.last_hidden_state.numpy(),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg="bert last hidden")
        np.testing.assert_allclose(np.asarray(pooled),
                                   bert_out.pooler_output.numpy(),
                                   rtol=1e-3, atol=1e-4, err_msg="bert pooled")
        # the last-4-layer aggregation window feeds the text embeddings
        # (reference text_encoder.py:97-103) — pin those hidden states too
        for i in (9, 10, 11, 12):
            np.testing.assert_allclose(
                np.asarray(hidden[i]), bert_out.hidden_states[i].numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"bert hidden {i}")

    def test_strict_raises_on_unconsumed_checkpoint_key(self, tmp_path):
        """A checkpoint key outside the remap's layout (here: an extra
        projection the converter doesn't know) must fail strict loading
        instead of being silently dropped."""
        import jax
        import jax.numpy as jnp
        from transformers import BertConfig as HFBertConfig, BertModel as HFBert

        from medmoe_tpu.models.bert import BertConfig, BertModel
        from medmoe_tpu.models.convert import load_medclip_checkpoint

        hf = HFBert(HFBertConfig(vocab_size=120, hidden_size=16,
                                 num_hidden_layers=2, num_attention_heads=2,
                                 intermediate_size=32))
        sd = {f"text_model.{k}": v for k, v in hf.state_dict().items()}
        sd["text_model.extra_projection.weight"] = torch.zeros(4, 4)
        bad = str(tmp_path / "bad.bin")
        torch.save(sd, bad)

        bert = BertModel(BertConfig(vocab_size=120, hidden_size=16,
                                    num_layers=2, num_heads=2,
                                    intermediate_size=32, dtype=jnp.float32))
        ids = np.zeros((1, 4), np.int32)
        params = jax.jit(bert.init)(jax.random.PRNGKey(0), ids,
                                    np.ones_like(ids), ids)["params"]
        tree = {"text_encoder": {"bert": params}}
        with pytest.raises(ValueError, match="extra_projection"):
            load_medclip_checkpoint(tree, bad, num_layers=2, strict=True)

        # keys OUTSIDE the vision_model./text_model. prefixes were
        # previously discarded before coverage tracking ever saw them —
        # strict must reject those too (e.g. a top-level logit_scale)
        sd2 = {f"text_model.{k}": v for k, v in hf.state_dict().items()}
        sd2["logit_scale"] = torch.zeros(())
        bad2 = str(tmp_path / "bad2.bin")
        torch.save(sd2, bad2)
        with pytest.raises(ValueError, match="logit_scale"):
            load_medclip_checkpoint(tree, bad2, num_layers=2, strict=True)
