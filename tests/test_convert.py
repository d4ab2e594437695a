"""Checkpoint-conversion parity: our flax towers must reproduce HF torch
models numerically when loaded with converted weights (the 0.5%-parity gate
of SURVEY §7 'hard parts' #3). HF models are built from config (no network)
with random weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_swin():
    from transformers import SwinConfig, SwinModel

    cfg = SwinConfig(image_size=56, patch_size=4, num_channels=3,
                     embed_dim=8, depths=[1, 1], num_heads=[1, 2],
                     window_size=7, mlp_ratio=4.0, qkv_bias=True,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    model = SwinModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def hf_bert():
    from transformers import BertConfig as HFBertConfig, BertModel

    cfg = HFBertConfig(vocab_size=120, hidden_size=16, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=32,
                       max_position_embeddings=64, type_vocab_size=2,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    model = BertModel(cfg)
    model.eval()
    return model


class TestSwinParity:
    def test_outputs_match_hf(self, hf_swin):
        from medmoe_tpu.models.convert import convert_hf_swin
        from medmoe_tpu.models.swin import SwinBackbone, SwinConfig

        x = np.random.RandomState(0).randn(2, 3, 56, 56).astype(np.float32)
        with torch.no_grad():
            out = hf_swin(torch.from_numpy(x), output_hidden_states=True)

        cfg = SwinConfig(image_size=56, embed_dim=8, depths=(1, 1),
                         num_heads=(1, 2), window_size=7, drop_path_rate=0.0,
                         dtype=jnp.float32)
        m = SwinBackbone(cfg)
        x_nhwc = x.transpose(0, 2, 3, 1)
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x_nhwc)
        sd = {k: v.numpy() for k, v in hf_swin.state_dict().items()}
        converted = convert_hf_swin(sd, depths=(1, 1))
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        from medmoe_tpu.models.convert import _merge_into

        n = _merge_into(params, converted)
        assert n >= 20   # every array must land

        pyramid, final = jax.jit(m.apply)({"params": params}, x_nhwc)

        # hidden_states[0] = embedding output, [1] = stage1 out (downsampled)
        np.testing.assert_allclose(
            np.asarray(pyramid[0]), out.hidden_states[0].numpy(),
            rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(pyramid[1]), out.hidden_states[1].numpy(),
            rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(final), out.last_hidden_state.numpy(),
            rtol=2e-4, atol=2e-5)


class TestBertParity:
    def test_outputs_match_hf(self, hf_bert):
        from medmoe_tpu.models.bert import BertConfig, BertModel
        from medmoe_tpu.models.convert import convert_hf_bert, _merge_into

        rng = np.random.RandomState(0)
        ids = rng.randint(0, 120, size=(2, 10)).astype(np.int32)
        mask = np.ones((2, 10), np.int32)
        mask[1, 7:] = 0
        types = np.zeros((2, 10), np.int32)

        with torch.no_grad():
            out = hf_bert(torch.from_numpy(ids).long(),
                          torch.from_numpy(mask).long(),
                          torch.from_numpy(types).long(),
                          output_hidden_states=True)

        cfg = BertConfig(vocab_size=120, hidden_size=16, num_layers=2,
                         num_heads=2, intermediate_size=32,
                         max_position_embeddings=64, dtype=jnp.float32)
        m = BertModel(cfg)
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), ids, mask, types)
        sd = {k: v.numpy() for k, v in hf_bert.state_dict().items()}
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        n = _merge_into(params, convert_hf_bert(sd, num_layers=2))
        assert n >= 20

        last, pooled, hidden = jax.jit(m.apply)({"params": params}, ids,
                                                mask, types)
        np.testing.assert_allclose(np.asarray(last),
                                   out.last_hidden_state.numpy(),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(),
                                   rtol=2e-4, atol=2e-5)
        for i in (0, 1, 2):
            np.testing.assert_allclose(np.asarray(hidden[i]),
                                       out.hidden_states[i].numpy(),
                                       rtol=2e-4, atol=2e-5)


class TestMedclipGate:
    def test_missing_checkpoint_is_noop(self):
        from medmoe_tpu.models.convert import load_medclip_checkpoint

        params = {"a": np.zeros((2,))}
        out = load_medclip_checkpoint(params, "/nonexistent/path.bin")
        assert out is params
