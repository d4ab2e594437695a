"""LoRA adapters (reference src/models/components/lora_layers.py — the
Microsoft LoRA reference implementation, 501 LoC of torch).

Functional flax re-design: each adapted layer owns frozen base params plus
low-rank ``lora_a``/``lora_b`` factors; the effective weight is
``W + (B @ A) * (alpha / r)``. The torch version mutates weights on
train()/eval() to merge/unmerge — in flax that statefulness becomes the pure
``merge_lora(params)`` transform (returns a tree with factors folded in and
removed), which is also the right deployment story on TPU (zero inference
overhead).

Freezing the base weights is the caller's job via optimizer masking /
stop_gradient (see lora_param_mask) — matching ``mark_only_lora_as_trainable``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class LoRALinear(nn.Module):
    """Dense with optional low-rank update (reference lora_layers.py:90-152)."""

    features: int
    r: int = 0
    alpha: int = 1
    dropout_rate: float = 0.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     param_dtype=jnp.float32, name="base")(x)
        if self.r > 0:
            in_dim = x.shape[-1]
            a = self.param("lora_a", nn.initializers.he_uniform(),
                           (in_dim, self.r), jnp.float32)
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.r, self.features), jnp.float32)
            h = x
            if self.dropout_rate > 0:
                h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            y = y + (h.astype(jnp.float32) @ a @ b) * (self.alpha / self.r)
        return y


class LoRAEmbedding(nn.Module):
    """Embedding with low-rank update (reference lora_layers.py:32-87)."""

    num_embeddings: int
    features: int
    r: int = 0
    alpha: int = 1

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = nn.Embed(self.num_embeddings, self.features,
                         param_dtype=jnp.float32, name="base")
        # explicit take with zero fill: jnp.take's default OOB mode fills
        # NaN for floats, silently poisoning downstream losses on a
        # tokenizer/vocab mismatch (same convention as models/bert.py)
        y = jnp.take(table.embedding, ids, axis=0,
                     mode="fill", fill_value=0.0)
        if self.r > 0:
            a = self.param("lora_a", nn.initializers.zeros,
                           (self.num_embeddings, self.r), jnp.float32)
            b = self.param("lora_b", nn.initializers.normal(1.0),
                           (self.r, self.features), jnp.float32)
            y = y + (jnp.take(a, ids, axis=0, mode="fill", fill_value=0.0)
                     @ b) * (self.alpha / self.r)
        return y


class LoRAConv(nn.Module):
    """Conv2d with low-rank update on the flattened kernel
    (reference ConvLoRA, lora_layers.py:246-309)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    r: int = 0
    alpha: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (kh, kw, in_ch, self.features), jnp.float32)
        if self.r > 0:
            a = self.param("lora_a", nn.initializers.he_uniform(),
                           (self.r, kh * kw * in_ch), jnp.float32)
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.features, self.r), jnp.float32)
            delta = (b @ a).T.reshape(kh, kw, in_ch, self.features)
            kernel = kernel + delta * (self.alpha / self.r)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y


class LoRAMergedLinear(nn.Module):
    """qkv-style fused projection with LoRA on a subset of the fused outputs
    (reference MergedLinear, lora_layers.py:155-244): ``enable_lora`` flags
    which equal-sized output blocks get adapters."""

    features: int
    enable_lora: Sequence[bool] = (True, False, True)
    r: int = 0
    alpha: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     param_dtype=jnp.float32, name="base")(x)
        n_blocks = len(self.enable_lora)
        if self.r > 0 and any(self.enable_lora):
            block = self.features // n_blocks
            in_dim = x.shape[-1]
            n_on = sum(self.enable_lora)
            a = self.param("lora_a", nn.initializers.he_uniform(),
                           (in_dim, self.r * n_on), jnp.float32)
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.r * n_on, block), jnp.float32)
            deltas = []
            on = 0
            for enabled in self.enable_lora:
                if enabled:
                    a_i = a[:, on * self.r:(on + 1) * self.r]
                    b_i = b[on * self.r:(on + 1) * self.r]
                    deltas.append((x.astype(jnp.float32) @ a_i @ b_i)
                                  * (self.alpha / self.r))
                    on += 1
                else:
                    deltas.append(jnp.zeros(x.shape[:-1] + (block,),
                                            jnp.float32))
            y = y + jnp.concatenate(deltas, axis=-1)
        return y


class LoRAMultiheadAttention(nn.Module):
    """Multi-head attention with per-projection LoRA adapters (reference
    PlainMultiheadAttentionLoRA, lora_layers.py:312-501 — rebuilds an
    nn.MultiheadAttention with LoRA on selected q/k/v/out projections)."""

    dim: int
    num_heads: int
    r: int = 8
    alpha: int = 16
    dropout_rate: float = 0.0
    enable_lora: Tuple[bool, bool, bool, bool] = (True, False, True, True)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray,
                 key: Optional[jnp.ndarray] = None,
                 value: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        key = query if key is None else key
        value = key if value is None else value
        q_on, k_on, v_on, o_on = self.enable_lora

        def proj(name, enabled):
            r = self.r if enabled else 0
            return LoRALinear(self.dim, r=r, alpha=self.alpha,
                              dropout_rate=self.dropout_rate,
                              dtype=self.dtype, name=name)

        b, tq, _ = query.shape
        hd = self.dim // self.num_heads
        q = proj("q_proj", q_on)(query, deterministic).reshape(
            b, tq, self.num_heads, hd)
        k = proj("k_proj", k_on)(key, deterministic).reshape(
            b, key.shape[1], self.num_heads, hd)
        v = proj("v_proj", v_on)(value, deterministic).reshape(
            b, value.shape[1], self.num_heads, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(jnp.float32(hd))
        if mask is not None:
            attn = jnp.where(mask, attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(query.dtype).reshape(b, tq, self.dim)
        return proj("out_proj", o_on)(out, deterministic)


# --------------------------------------------------------------------------
# functional utilities (replace torch's stateful merge/freeze)
# --------------------------------------------------------------------------

def lora_param_mask(params: Any) -> Any:
    """True for LoRA factors, False elsewhere — feed to optax.masked to train
    only adapters (reference mark_only_lora_as_trainable)."""

    def mask(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        return any(k.startswith("lora_") for k in keys)

    return jax.tree_util.tree_map_with_path(mask, params)


def merge_lora(params: Dict[str, Any],
               alpha_over_r: Optional[float] = None) -> Dict[str, Any]:
    """Fold lora_a/lora_b into the base weights and drop the factors
    (the functional analogue of the reference's eval-time merge).

    ``alpha_over_r`` is the adapter scale (LoRA alpha / r) and is required
    whenever the tree contains any factors — a silent 1.0 default would
    produce an unscaled (wrong) merge. Handles LoRALinear ('base.kernel'),
    LoRAConv ('kernel', flattened-kernel factorization) and LoRAEmbedding
    ('base.embedding'). LoRAMergedLinear factors are block-structured (which
    output blocks are adapted is a module attribute, not recoverable from
    the params) — those nodes are left intact, un-merged, so applying the
    module still produces identical outputs.
    """

    def walk(node):
        if not isinstance(node, dict):
            return node
        node = {k: walk(v) for k, v in node.items()}
        if "lora_a" not in node or "lora_b" not in node:
            return node
        a, b = node["lora_a"], node["lora_b"]
        base = node.get("base")
        if isinstance(base, dict) and "kernel" in base \
                and (a.shape[0], b.shape[1]) == base["kernel"].shape:
            if alpha_over_r is None:
                raise ValueError("merge_lora: alpha_over_r is required to "
                                 "fold LoRA factors (pass alpha / r)")
            node.pop("lora_a"), node.pop("lora_b")
            node["base"] = {**base,
                            "kernel": base["kernel"] + (a @ b) * alpha_over_r}
        elif isinstance(base, dict) and "embedding" in base \
                and (a.shape[0], b.shape[1]) == base["embedding"].shape:
            if alpha_over_r is None:
                raise ValueError("merge_lora: alpha_over_r is required to "
                                 "fold LoRA factors (pass alpha / r)")
            node.pop("lora_a"), node.pop("lora_b")
            node["base"] = {**base, "embedding":
                            base["embedding"] + (a @ b) * alpha_over_r}
        elif "kernel" in node:           # LoRAConv: factors over flat kernel
            kh, kw, in_ch, out = node["kernel"].shape
            if b.shape == (out, a.shape[0]) \
                    and a.shape[1] == kh * kw * in_ch:
                if alpha_over_r is None:
                    raise ValueError("merge_lora: alpha_over_r is required "
                                     "to fold LoRA factors (pass alpha / r)")
                node.pop("lora_a"), node.pop("lora_b")
                delta = (b @ a).T.reshape(kh, kw, in_ch, out)
                node["kernel"] = node["kernel"] + delta * alpha_over_r
        # anything else (e.g. LoRAMergedLinear): leave factors in place
        return node

    return walk(dict(params))
