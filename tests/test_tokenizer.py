"""WordPiece tokenizer + merge-structure tests (reference
text_encoder.py:32-90 aggregate_tokens semantics)."""

import numpy as np

from medmoe_tpu.data.tokenizer import (WordPieceTokenizer, build_vocab,
                                       basic_tokenize)

VOCAB = {t: i for i, t in enumerate(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
     "chest", "x", "##ray", "shows", "pneu", "##mon", "##ia", "mri", "scan",
     "of", "the", "brain", ",", "."])}


def tok():
    return WordPieceTokenizer(VOCAB)


class TestWordPiece:
    def test_greedy_split(self):
        assert tok().wordpiece("xray") == ["x", "##ray"]
        assert tok().wordpiece("pneumonia") == ["pneu", "##mon", "##ia"]
        assert tok().wordpiece("chest") == ["chest"]
        assert tok().wordpiece("zzz") == ["[UNK]"]

    def test_basic_tokenize_punct(self):
        assert basic_tokenize("chest, xray.") == ["chest", ",", "xray", "."]

    def test_encode_shapes_static(self):
        enc = tok().encode_batch(["chest xray", "mri of the brain"], max_length=9)
        assert enc["input_ids"].shape == (2, 9)
        assert enc["segment_ids"].shape == (2, 9)
        # always statically padded — both rows full length
        # [CLS] chest x ##ray [SEP] = 5; [CLS] mri of the brain [SEP] = 6
        assert enc["attention_mask"].sum(1).tolist() == [5, 6]

    def test_segment_ids_merge_structure(self):
        enc = tok().encode_batch(["chest xray shows pneumonia"], max_length=12)
        # tokens: [CLS] chest x ##ray shows pneu ##mon ##ia [SEP]
        ids = enc["segment_ids"][0].tolist()
        assert ids[:9] == [0, 1, 2, 2, 3, 4, 4, 4, 5]
        assert all(i == -1 for i in ids[9:])          # padding dropped
        assert enc["sents"][0][:6] == ["[CLS]", "chest", "xray", "shows",
                                       "pneumonia", "[SEP]"]
        # cap_lens = words not starting with '[' + 1 (reference
        # medmoe_module.py:221-223)
        assert enc["cap_lens"][0] == 5

    def test_truncation_keeps_sep(self):
        enc = tok().encode_batch(["chest xray shows pneumonia"], max_length=5)
        ids = enc["input_ids"][0]
        assert ids[0] == VOCAB["[CLS]"]
        assert ids[4] == VOCAB["[SEP]"]
        assert enc["attention_mask"][0].sum() == 5

    def test_matches_hf_reference_semantics(self):
        """Cross-check segment merge against a direct reimplementation of the
        reference's bank-flush loop over token strings."""
        texts = ["chest xray shows pneumonia", "mri of the brain .",
                 "pneumonia pneumonia", "x"]
        t = 10
        enc = tok().encode_batch(texts, max_length=t)
        for i, text in enumerate(texts):
            pieces = tok().tokenize(text)[: t - 2]
            tokens = ["[CLS]"] + pieces + ["[SEP]"]
            # reference algorithm (text_encoder.py:48-77)
            slots, words, bank = [], [], []
            for token in tokens:
                if token == "[SEP]":
                    words.append("".join(bank))
                    slots.append(len(words))   # SEP's own slot
                    words.append(token)
                    break
                if not token.startswith("##"):
                    if bank:
                        words.append("".join(bank))
                    bank = [token]
                    slots.append(len(words))
                else:
                    bank.append(token[2:])
                    slots.append(len(words))
            got = enc["segment_ids"][i][: len(tokens)].tolist()
            assert got == slots, (text, got, slots)
            cap = len([w for w in words if not w.startswith("[")]) + 1
            assert enc["cap_lens"][i] == cap


class TestBuildVocab:
    def test_round_trip(self):
        corpus = ["the quick brown fox", "jumps over the lazy dog"]
        v = build_vocab(corpus)
        t = WordPieceTokenizer(v)
        pieces = t.tokenize("the quick fox jumps")
        assert "[UNK]" not in pieces
        # unseen word should still split via characters, not become [UNK]
        pieces2 = t.tokenize("foxdog")
        assert "[UNK]" not in pieces2


class TestMergeOnDevice:
    def test_segment_sum_matches_loop(self):
        import jax.numpy as jnp

        from medmoe_tpu.models.text_encoder import merge_wordpieces

        rng = np.random.RandomState(0)
        b, l, t, d = 2, 3, 8, 4
        emb = rng.randn(b, l, t, d).astype(np.float32)
        seg = np.array([[0, 1, 1, 2, 3, -1, -1, -1],
                        [0, 1, 2, 2, 2, 3, 4, -1]], dtype=np.int32)
        got = np.asarray(merge_wordpieces(jnp.asarray(emb), jnp.asarray(seg)))
        expected = np.zeros_like(emb)
        for bi in range(b):
            for ti in range(t):
                s = seg[bi, ti]
                if s >= 0:
                    expected[bi, :, s] += emb[bi, :, ti]
        np.testing.assert_allclose(got, expected, rtol=1e-5)
