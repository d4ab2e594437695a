"""BERT text encoder, written TPU-first in JAX/Flax.

Re-implements the behavior the reference gets from HF
``AutoModel.from_pretrained('emilyalsentzer/Bio_ClinicalBERT')``
(reference src/models/components/text_encoder.py:18-22): a BERT-base encoder
returning all per-layer hidden states so the caller can aggregate the last N
layers.

TPU-native: static [B, T=25] shapes (the tokenizer pads to max_length
statically — the reference pads 'longest' dynamically, which would force an
XLA recompile per batch shape), bf16 activations, one fused attention einsum
per layer, additive mask built once.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from medmoe_tpu.models.layers import Fp32LayerNorm


@struct.dataclass
class BertConfig:
    vocab_size: int = 28996          # Bio_ClinicalBERT (bert-base-cased vocab)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    # HF bert-base defaults; active only in train mode (deterministic=False).
    # NOTE the reference runs these even on the frozen tower: Lightning puts
    # the whole model in train() and freeze_bert only stops gradients
    # (reference text_encoder.py:27-30), so frozen-BERT embeddings are
    # dropout-noisy during training there too.
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_cfg(cls, cfg) -> "BertConfig":
        """Build from a `text` config node (the single source of truth —
        every BertModel instantiated against the same node must agree on
        parameter shapes, incl. max_position_embeddings)."""
        return cls(
            vocab_size=int(cfg.get("vocab_size", 28996)),
            hidden_size=int(cfg.get("hidden_size", 768)),
            num_layers=int(cfg.get("num_layers", 12)),
            num_heads=int(cfg.get("num_heads", 12)),
            intermediate_size=int(cfg.get("intermediate_size", 3072)),
            max_position_embeddings=int(
                cfg.get("max_position_embeddings", 512)),
            hidden_dropout_prob=float(
                cfg.get("hidden_dropout_prob", 0.1)),
            attention_probs_dropout_prob=float(
                cfg.get("attention_probs_dropout_prob", 0.1)),
            dtype=jnp.dtype(cfg.get("dtype", "bfloat16")))


class OneHotEmbed(nn.Embed):
    """``nn.Embed`` with the row gather replaced by a one-hot matmul.

    Identical parameter tree (``embedding``) and identical values — the
    one-hot rows select exactly one table row (zeros contribute exactly
    0.0; Precision.HIGHEST keeps the f32 row bit-faithful through the MXU
    pass decomposition). On TPU the forward gather and — far worse — its
    scatter-add vjp (the embedding-table gradient) fall off the vector
    units; as matmuls both directions ride the MXU. ONLY for tiny tables
    (token types): at word-vocab size the [B·T, V] one-hot is a ~0.5 GB
    HBM transient — use GatherEmbed there.
    """

    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        onehot = jax.nn.one_hot(inputs, self.num_embeddings, dtype=jnp.float32)
        return jax.lax.dot_general(
            onehot, self.embedding.astype(jnp.float32),
            dimension_numbers=(((onehot.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)


@jax.custom_vjp
def _gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    # out-of-range ids → zero rows (mode='fill'), matching OneHotEmbed's
    # all-zero one-hot row AND this vjp's backward (whose one-hot drops
    # OOB ids, i.e. the gradient of a zero constant). jnp.take's default
    # fill is NaN for floats, which silently poisons the whole loss.
    return jnp.take(table, ids, axis=0, mode="fill", fill_value=0.0)


def _gather_rows_fwd(table, ids):
    out = jnp.take(table, ids, axis=0, mode="fill", fill_value=0.0)
    return out, (ids, table.shape[0])


def _gather_rows_bwd(residuals, g):
    ids, n_rows = residuals
    # the table gradient as a one-hot contraction instead of take's vjp (a
    # serialized scatter-add off the vector units). One-hot entries are
    # exactly 1.0/0.0 so each row's contribution is g's row verbatim; the
    # f32 accumulation matches scatter-add up to summation order.
    onehot = jax.nn.one_hot(ids.reshape(-1), n_rows, dtype=jnp.float32)
    d_table = jax.lax.dot_general(
        onehot, g.reshape(-1, g.shape[-1]).astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return d_table, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


class GatherEmbed(nn.Embed):
    """``nn.Embed`` for LARGE tables (the word vocab): forward stays the
    plain row gather (one [B·T]-row DMA — cheap), only the backward runs as
    the one-hot matmul. The [B·T, V] one-hot therefore exists only inside
    the fused backward matmul instead of being a forward HBM transient, and
    the table gradient still rides the MXU instead of take's scatter-add
    vjp (ADVICE r2: the forward one-hot cost ~0.5 GB at B=32, T=128)."""

    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return _gather_rows(self.embedding.astype(jnp.float32), inputs)


class SliceEmbed(nn.Embed):
    """``nn.Embed`` for tables indexed by a static arange (positions):
    the lookup is a static slice ``table[:t]`` — no indexing op at all."""

    def __call__(self, t: int) -> jnp.ndarray:
        return self.embedding[None, :t, :]


class BertEmbeddings(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool = True):
        cfg = self.config
        b, t = input_ids.shape
        word = GatherEmbed(cfg.vocab_size, cfg.hidden_size,
                           param_dtype=jnp.float32,
                           name="word_embeddings")(input_ids)
        pos = SliceEmbed(cfg.max_position_embeddings, cfg.hidden_size,
                         param_dtype=jnp.float32,
                         name="position_embeddings")(t)
        typ = OneHotEmbed(cfg.type_vocab_size, cfg.hidden_size,
                          param_dtype=jnp.float32,
                          name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = Fp32LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x.astype(cfg.dtype)


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, additive_mask, deterministic: bool = True):
        cfg = self.config
        b, t, d = x.shape
        head_dim = cfg.hidden_size // cfg.num_heads

        def dense(name):
            return nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                            param_dtype=jnp.float32, name=name)

        q = dense("query")(x).reshape(b, t, cfg.num_heads, head_dim)
        k = dense("key")(x).reshape(b, t, cfg.num_heads, head_dim)
        v = dense("value")(x).reshape(b, t, cfg.num_heads, head_dim)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(jnp.float32(head_dim)) + additive_mask
        attn = jax.nn.softmax(attn, axis=-1).astype(cfg.dtype)
        attn = nn.Dropout(cfg.attention_probs_dropout_prob)(
            attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(cfg.dtype)
        return out.reshape(b, t, cfg.hidden_size)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, additive_mask, deterministic: bool = True):
        cfg = self.config
        drop = nn.Dropout(cfg.hidden_dropout_prob)
        attn_out = BertSelfAttention(cfg, name="attention")(
            x, additive_mask, deterministic=deterministic)
        attn_out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                            param_dtype=jnp.float32, name="attention_output")(attn_out)
        attn_out = drop(attn_out, deterministic=deterministic)
        x = Fp32LayerNorm(epsilon=cfg.layer_norm_eps,
                          name="attention_norm")(x + attn_out)
        ffn = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                       param_dtype=jnp.float32, name="intermediate")(x)
        ffn = nn.gelu(ffn, approximate=False)
        ffn = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                       param_dtype=jnp.float32, name="output")(ffn)
        ffn = drop(ffn, deterministic=deterministic)
        return Fp32LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="output_norm")(x + ffn)


class BertModel(nn.Module):
    """Returns (last_hidden, pooled, all_hidden_states) like HF with
    output_hidden_states=True."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        cfg = self.config
        x = BertEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        additive_mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                                  -1e9).astype(jnp.float32)
        hidden_states = (x,)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(
                x, additive_mask, deterministic=deterministic)
            hidden_states = hidden_states + (x,)
        pooled = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                          param_dtype=jnp.float32, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled, hidden_states
