"""Text tower: BERT + last-N-layer aggregation + wordpiece merging.

Re-implements reference src/models/components/text_encoder.py TPU-first.
The reference merges '##'-continuation wordpieces with a per-token python
loop on the host (text_encoder.py:32-90) — a CPU hot spot in its training
step. Here the merge structure is precomputed at tokenization time as a
static segment-id matrix (see medmoe_tpu/data/tokenizer.py) and applied on
device as one one-hot matmul (a segment-sum the MXU eats for free), so the
whole text tower stays inside the jitted step.

Semantics reproduced exactly:
  * stack the last ``last_n_layers`` hidden states  (text_encoder.py:97-103)
  * sum consecutive '##' pieces into their word's slot; [SEP] gets its own
    slot; everything after [SEP] is zero-padding      (text_encoder.py:48-77)
  * sent_embeddings = mean over ALL T positions (zero padding included —
    the reference divides by the full padded length)  (text_encoder.py:110)
  * 'sum' or 'mean' aggregation over layers           (text_encoder.py:112-117)
  * optional global/local projection heads + L2 norm  (text_encoder.py:128-142)
  * returns word_embeddings [B, D, T] (channel-first) (text_encoder.py:131)
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from medmoe_tpu.models.bert import BertConfig, BertModel
from medmoe_tpu.models.layers import l2_normalize


def merge_wordpieces(stacked: jnp.ndarray, segment_ids: jnp.ndarray) -> jnp.ndarray:
    """Sum token embeddings into merged-word slots.

    stacked:     [B, L, T, D] per-layer token embeddings
    segment_ids: [B, T] int32, slot index for every token (< 0 → dropped,
                 i.e. padding after [SEP])
    returns      [B, L, T, D] with slot j = Σ_{t: seg[t]=j} token_t, zero-padded.
    """
    t = stacked.shape[2]
    # one-hot [B, T(token), T(slot)]; negative ids produce all-zero rows
    onehot = (segment_ids[:, :, None] == jnp.arange(t)[None, None, :])
    onehot = onehot.astype(stacked.dtype)
    return jnp.einsum("bts,bltd->blsd", onehot, stacked,
                      preferred_element_type=jnp.float32).astype(stacked.dtype)


class BertTextEncoder(nn.Module):
    """Flax analogue of the reference BertEncoder facade."""

    cfg: Any                               # the `text` DotDict config node
    bert_config: Optional[BertConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids, segment_ids,
                 deterministic: bool = True):
        cfg = self.cfg
        bert_cfg = self.bert_config or BertConfig.from_cfg(cfg)
        last_n = int(cfg.get("last_n_layers", 4))
        agg_method = cfg.get("aggregate_method", "sum")
        embed_dim = int(cfg.get("embed_dim", 768))

        _, _, hidden_states = BertModel(bert_cfg, name="bert")(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic)

        if last_n > 1:
            stacked = jnp.stack(hidden_states[-last_n:], axis=1)  # [B, L, T, D]
            if cfg.get("agg_tokens", True):
                stacked = merge_wordpieces(stacked, segment_ids)
            sent = jnp.mean(stacked, axis=2)                      # [B, L, D]
            if agg_method == "sum":
                word = jnp.sum(stacked, axis=1)                   # [B, T, D]
                sent = jnp.sum(sent, axis=1)                      # [B, D]
            elif agg_method == "mean":
                word = jnp.mean(stacked, axis=1)
                sent = jnp.mean(sent, axis=1)
            else:
                raise ValueError(f"aggregate_method {agg_method!r} not implemented")
        else:
            word = hidden_states[-1]
            sent = jnp.mean(word, axis=1)

        if cfg.get("projection", False):
            word = nn.Dense(embed_dim, param_dtype=jnp.float32,
                            name="emb_local")(word)
            sent = nn.Dense(embed_dim, param_dtype=jnp.float32,
                            name="emb_global")(sent)

        word = word.transpose(0, 2, 1)                            # [B, D, T]

        if cfg.get("norm", False):
            # reference normalizes over dim=1: D for words, D for sent
            word = l2_normalize(word, axis=1)
            sent = l2_normalize(sent, axis=1)

        return word, sent
