"""Direct model-level parity against the reference's torch modules:
the reference Expert/MoE (src/models/components/swin.py) and the wordpiece
aggregation loop (src/models/components/text_encoder.py), run as-is with
weights transplanted into medmoe_tpu's layout."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_compat import REFERENCE_ROOT, _stub, load_reference_losses

# losses import also prepares the sys.path/stub environment
pytestmark = pytest.mark.skipif(load_reference_losses() is None,
                                reason="reference tree not available")

import torch  # noqa: E402


def _load_ref_swin():
    for name in ("open_clip", "open_clip.transformer", "huggingface_hub"):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            _stub(name)
    import src.models.components.swin as ref_swin  # noqa: PLC0415

    return ref_swin


def _load_ref_text_encoder():
    import src.models.components.text_encoder as ref_te  # noqa: PLC0415

    return ref_te


class TestExpertParity:
    def _transplant(self, ref_moe, num_experts, hidden_dims, out_dim):
        """reference MoE torch weights → ExpertBank stacked params +
        router params (shared helper: tests/helpers.py)."""
        from tests.helpers import moe_params_from_ref

        return moe_params_from_ref(ref_moe, len(hidden_dims))

    @pytest.mark.parametrize("mode", ["gather", "dense", "topk"])
    def test_moe_block_matches_reference(self, mode):
        from medmoe_tpu.models.moe import MoE, MoEConfig

        ref_swin = _load_ref_swin()
        torch.manual_seed(0)
        hidden_dims, out_dim, k = [4, 8], 8, 3
        ref_moe = ref_swin.MoE(num_experts=k, hidden_dims=hidden_dims,
                               output_dim=out_dim, router_input_dim=8)
        ref_moe.eval()

        rng = np.random.RandomState(0)
        # square patch counts so local reshape works: 16 and 4
        pyramid_np = [rng.randn(5, 16, 4).astype(np.float32),
                      rng.randn(5, 4, 8).astype(np.float32)]
        router_feat = rng.randn(5, 8).astype(np.float32)

        with torch.no_grad():
            ref_g, ref_l, ref_r = ref_moe(
                [torch.tensor(p) for p in pyramid_np],
                torch.tensor(router_feat))

        cfg = MoEConfig(num_experts=k, hidden_dims=tuple(hidden_dims),
                        output_dim=out_dim, router_input_dim=8, mode=mode,
                        capacity_factor=float(k), dtype=jnp.float32)
        params = self._transplant(ref_moe, k, hidden_dims, out_dim)
        g, l, r = MoE(cfg).apply({"params": params},
                                 [jnp.asarray(p) for p in pyramid_np],
                                 jnp.asarray(router_feat))
        np.testing.assert_allclose(np.asarray(r), ref_r.numpy(), rtol=2e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g), ref_g.numpy(), rtol=2e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(l), ref_l.numpy(), rtol=2e-4,
                                   atol=1e-5)


class TestAggregateTokensParity:
    def test_wordpiece_merge_matches_reference_loop(self):
        from medmoe_tpu.data.tokenizer import WordPieceTokenizer
        from medmoe_tpu.models.text_encoder import merge_wordpieces

        ref_te = _load_ref_text_encoder()

        vocab = {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "chest", "x", "##ray", "shows", "pneu", "##mon", "##ia",
             "normal", "scan"])}
        tok = WordPieceTokenizer(vocab)
        texts = ["chest xray shows pneumonia", "normal scan", "xray"]
        t_len = 10
        enc = tok.encode_batch(texts, max_length=t_len)

        # reference BertEncoder.aggregate_tokens without constructing the
        # HF model: only idxtoword is used by the method
        bert = ref_te.BertEncoder.__new__(ref_te.BertEncoder)
        bert.idxtoword = {v: k for k, v in vocab.items()}

        b, layers, d = len(texts), 2, 4
        rng = np.random.RandomState(0)
        embs = rng.randn(b, layers, t_len, d).astype(np.float32)
        ref_agg, ref_sents = bert.aggregate_tokens(
            torch.tensor(embs), torch.tensor(enc["input_ids"].astype(
                np.int64)))

        ours = merge_wordpieces(jnp.asarray(embs),
                                jnp.asarray(enc["segment_ids"]))
        np.testing.assert_allclose(np.asarray(ours), ref_agg.numpy(),
                                   rtol=1e-5, atol=1e-6)
        assert [s[:6] for s in enc["sents"]] == \
            [s[:6] for s in ref_sents]

        # cap_lens convention (reference medmoe_module.py:221-223)
        for sent, cap in zip(ref_sents, enc["cap_lens"]):
            expected = len([w for w in sent if not w.startswith("[")]) + 1
            assert cap == expected
