"""Generic transformer components (reference vendored-torchmultimodal files:
multimodal_transformer.py, attention.py, transformer.py,
multi_head_attention.py, common.py).

Only ``TransformerOutput`` and ``FLAVATransformerWithoutEmbeddings`` are
referenced by the reference's model code (med_moe.py:6-9, unused in the
MedMoE forward path) but the whole family is part of the component surface:
pre/post-norm encoder layers with stochastic depth, decoder layers with
cross-attention and a kv-cache for autoregressive decoding, a functional
scaled-dot-product attention with attention- and head-masks, and the
axis-shift helper.

TPU notes: kv-cache is a flax 'cache' variable collection with a static
max length and a position index (the jit-able form of the reference's
growing python-side cache); everything else is standard fused einsums.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from medmoe_tpu.models.layers import Fp32LayerNorm, Mlp, gelu_exact


class TransformerOutput(NamedTuple):
    """reference transformer.py:23-29."""

    last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None
    hidden_states: Optional[Tuple[jnp.ndarray, ...]] = None
    attentions: Optional[Tuple[jnp.ndarray, ...]] = None


def shift_dim(x: jnp.ndarray, src_dim: int = -1, dest_dim: int = -1
              ) -> jnp.ndarray:
    """Move one axis to another position (reference common.py:12-52)."""
    n = x.ndim
    src = src_dim % n
    dest = dest_dim % n
    perm = [i for i in range(n) if i != src]
    perm.insert(dest, src)
    return x.transpose(perm)


def scaled_dot_product_attention(
        q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        head_mask: Optional[jnp.ndarray] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., H, T, hd] attention with optional additive mask + head mask
    (reference attention.py:185-241)."""
    attn = jnp.einsum("...qd,...kd->...qk", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn / jnp.sqrt(jnp.float32(q.shape[-1]))
    if attention_mask is not None:
        attn = jnp.where(attention_mask, attn, -1e30)
    attn = jax.nn.softmax(attn, axis=-1)
    if head_mask is not None:
        attn = attn * head_mask
    out = jnp.einsum("...qk,...kd->...qd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out, attn


def split_multihead(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, T, D] → [B, H, T, D/H] (reference attention.py:244-250)."""
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_multihead(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, hd] → [B, T, D] (reference attention.py:252-256)."""
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


class MultiHeadAttention(nn.Module):
    """q/k/v/out-projected MHA with optional kv-cache for decoding
    (reference attention.py:70-182 + multi_head_attention.py)."""

    dim: int
    num_heads: int
    use_cache: bool = False
    max_cache_length: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray,
                 key: Optional[jnp.ndarray] = None,
                 value: Optional[jnp.ndarray] = None,
                 attention_mask: Optional[jnp.ndarray] = None,
                 head_mask: Optional[jnp.ndarray] = None,
                 decode_step: Optional[jnp.ndarray] = None):
        key = query if key is None else key
        value = key if value is None else value

        def dense(name):
            return nn.Dense(self.dim, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)

        q = split_multihead(dense("q_proj")(query), self.num_heads)
        k = split_multihead(dense("k_proj")(key), self.num_heads)
        v = split_multihead(dense("v_proj")(value), self.num_heads)

        if self.use_cache:
            b = query.shape[0]
            hd = self.dim // self.num_heads
            cache_k = self.variable(
                "cache", "k", jnp.zeros,
                (b, self.num_heads, self.max_cache_length, hd), self.dtype)
            cache_v = self.variable(
                "cache", "v", jnp.zeros,
                (b, self.num_heads, self.max_cache_length, hd), self.dtype)
            pos = decode_step if decode_step is not None else 0
            cache_k.value = jax.lax.dynamic_update_slice(
                cache_k.value, k, (0, 0, pos, 0))
            cache_v.value = jax.lax.dynamic_update_slice(
                cache_v.value, v, (0, 0, pos, 0))
            k, v = cache_k.value, cache_v.value
            # causal validity mask over the static cache
            valid = (jnp.arange(self.max_cache_length)[None, None, None, :]
                     <= pos + query.shape[1] - 1)
            attention_mask = valid if attention_mask is None \
                else jnp.logical_and(attention_mask, valid)

        out, attn = scaled_dot_product_attention(q, k, v, attention_mask,
                                                 head_mask)
        return dense("out_proj")(merge_multihead(out)), attn


class SelfAttention(nn.Module):
    """Attention over arbitrary flattened spatial dims
    (reference attention.py:15-67): input [B, ..., D] is flattened to a
    sequence, attended, and reshaped back."""

    dim: int
    num_heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        b, d = shape[0], shape[-1]
        seq = x.reshape(b, -1, d)
        mask = None
        if self.causal:
            t = seq.shape[1]
            mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        out, _ = MultiHeadAttention(self.dim, self.num_heads,
                                    dtype=self.dtype, name="mha")(
            seq, attention_mask=mask)
        return out.reshape(shape)


class TransformerEncoderLayer(nn.Module):
    """Pre- or post-norm encoder layer with stochastic depth
    (reference transformer.py:32-156 / multimodal_transformer.py:81-221)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    norm_first: bool = True
    drop_path: float = 0.0
    activation: Callable = gelu_exact
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 head_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        def drop_path(y):
            if deterministic or self.drop_path == 0.0:
                return y
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep,
                                        (y.shape[0],) + (1,) * (y.ndim - 1))
            return jnp.where(mask, y / keep, 0.0)

        attn = MultiHeadAttention(self.dim, self.num_heads, dtype=self.dtype,
                                  name="attention")
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                  activation=self.activation, dtype=self.dtype, name="mlp")
        norm1 = Fp32LayerNorm(epsilon=self.eps, name="norm1")
        norm2 = Fp32LayerNorm(epsilon=self.eps, name="norm2")

        if self.norm_first:
            y, attn_w = attn(norm1(x), attention_mask=attention_mask,
                             head_mask=head_mask)
            x = x + drop_path(y)
            x = x + drop_path(mlp(norm2(x)))
        else:
            y, attn_w = attn(x, attention_mask=attention_mask,
                             head_mask=head_mask)
            x = norm1(x + drop_path(y))
            x = norm2(x + drop_path(mlp(x)))
        return x, attn_w


class TransformerEncoder(nn.Module):
    """Layer stack returning all hidden states
    (reference transformer.py:159-257 / multimodal_transformer.py:224-295)."""

    num_layers: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    norm_first: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> TransformerOutput:
        hidden_states = (x,)
        attentions = ()
        for i in range(self.num_layers):
            dp = self.drop_path_rate * i / max(self.num_layers - 1, 1)
            x, attn = TransformerEncoderLayer(
                self.dim, self.num_heads, self.mlp_ratio, self.norm_first,
                dp, dtype=self.dtype, name=f"layer_{i}")(
                x, attention_mask=attention_mask, deterministic=deterministic)
            hidden_states = hidden_states + (x,)
            attentions = attentions + (attn,)
        return TransformerOutput(last_hidden_state=x,
                                 hidden_states=hidden_states,
                                 attentions=attentions)


class TransformerDecoderLayer(nn.Module):
    """Self-attn (cached) + cross-attn + FFN (reference
    transformer.py:259-661)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_cache: bool = False
    max_cache_length: int = 64
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, memory: jnp.ndarray,
                 self_mask: Optional[jnp.ndarray] = None,
                 cross_mask: Optional[jnp.ndarray] = None,
                 decode_step: Optional[jnp.ndarray] = None):
        y, _ = MultiHeadAttention(self.dim, self.num_heads,
                                  use_cache=self.use_cache,
                                  max_cache_length=self.max_cache_length,
                                  dtype=self.dtype, name="self_attention")(
            Fp32LayerNorm(epsilon=self.eps, name="norm1")(x),
            attention_mask=self_mask, decode_step=decode_step)
        x = x + y
        y, _ = MultiHeadAttention(self.dim, self.num_heads, dtype=self.dtype,
                                  name="cross_attention")(
            Fp32LayerNorm(epsilon=self.eps, name="norm2")(x), memory, memory,
            attention_mask=cross_mask)
        x = x + y
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(
            Fp32LayerNorm(epsilon=self.eps, name="norm3")(x))
        return x + y


class TransformerDecoder(nn.Module):
    num_layers: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_cache: bool = False
    max_cache_length: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, memory: jnp.ndarray,
                 self_mask: Optional[jnp.ndarray] = None,
                 cross_mask: Optional[jnp.ndarray] = None,
                 decode_step: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.dim, self.num_heads, self.mlp_ratio, self.use_cache,
                self.max_cache_length, dtype=self.dtype, name=f"layer_{i}")(
                x, memory, self_mask, cross_mask, decode_step)
        return x


class FLAVATransformerWithoutEmbeddings(nn.Module):
    """CLS prepend + encoder + final LN + pooler
    (reference multimodal_transformer.py:19-78)."""

    num_layers: int = 12
    dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    use_cls_token: bool = True
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> TransformerOutput:
        b = hidden_states.shape[0]
        if self.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.dim), jnp.float32)
            cls = jnp.broadcast_to(cls, (b, 1, self.dim)).astype(
                hidden_states.dtype)
            hidden_states = jnp.concatenate([cls, hidden_states], axis=1)

        out = TransformerEncoder(self.num_layers, self.dim, self.num_heads,
                                 self.mlp_ratio, norm_first=True,
                                 dtype=self.dtype, name="encoder")(
            hidden_states, attention_mask=attention_mask,
            deterministic=deterministic)
        last = Fp32LayerNorm(epsilon=self.eps, name="final_norm")(
            out.last_hidden_state)
        pooled = jnp.tanh(nn.Dense(self.dim, param_dtype=jnp.float32,
                                   name="pooler")(last[:, 0]))
        return TransformerOutput(last_hidden_state=last,
                                 pooler_output=pooled,
                                 hidden_states=out.hidden_states,
                                 attentions=out.attentions)
