"""Fused GLoRIA word-region similarity — Pallas TPU kernel.

Computes the [B_img, B_text] similarity matrix of the GLoRIA local loss
(medmoe_tpu/ops/losses.py gloria_local_loss; reference losses.py:961-1015):

    scores[m,t] = ⟨ctx[b,:,m], words[i,:,t]⟩          (MXU)
    a1 = softmax_t(scores  | t < cap_len_i)           (VPU)
    a2 = softmax_m(a1 · temp1)                        (VPU)
    wei[d,t] = Σ_m ctx[b,d,m] · a2[m,t]               (MXU)
    cos[t] = ⟨w_t, wei_t⟩ / (‖w_t‖·‖wei_t‖)
    sim[b,i] = temp3 · log Σ_{t<cap_len} exp(temp2 · cos[t])

Kernel layout: one grid cell per IMAGE; the [D, M] context block stays
resident in VMEM while all captions stream through in chunks, so the big
[M, T]-per-pair attention tensors never touch HBM (the XLA path materializes
or re-materializes them). Context HBM traffic is B·D·M instead of B²·D·M.

Backward runs through jax.custom_vjp with a rematerialized XLA vjp. MXU
inputs are bf16 with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _sim_kernel(cap_ref, ctx_ref, words_ref, out_ref, *, temp1: float,
                temp2: float, temp3: float, num_texts: int, t: int):
    # All ops stay strictly 2D — Mosaic cannot shape-cast across the
    # (sublane, lane) boundary, so the per-text loop is unrolled and each
    # text's words are a 2D lane-slice of the flattened [D, B·T] buffer.
    ctx = ctx_ref[0]                          # [D, M] bf16

    sims = []
    for i in range(num_texts):
        w_i = words_ref[0, :, pl.ds(i * t, t)]               # [D, T]
        cap = cap_ref[i]

        scores = jax.lax.dot_general(                         # [M, T]
            ctx, w_i, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        t_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = t_ids < cap
        scores = jnp.where(valid, scores, NEG_INF)

        a1 = jax.nn.softmax(scores, axis=1)                   # over words
        a2 = jax.nn.softmax(a1 * temp1, axis=0)               # over regions

        wei = jax.lax.dot_general(                            # [D, T]
            ctx.astype(jnp.float32), a2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        w32 = w_i.astype(jnp.float32)
        num = jnp.sum(w32 * wei, axis=0)                      # [T]
        den = jnp.sqrt(jnp.sum(w32 * w32, axis=0)) * jnp.sqrt(
            jnp.sum(wei * wei, axis=0))
        cos = num / jnp.maximum(den, 1e-8)

        row = jnp.where(valid[0], jnp.exp(cos * temp2), 0.0)  # [T]
        sims.append(jnp.log(jnp.sum(row)) * temp3)

    # scalars can't be stored to VMEM individually — emit the whole row once
    out_ref[0] = jnp.stack(sims)[None, :]


def _sim_forward(img_features: jnp.ndarray, words_emb: jnp.ndarray,
                 cap_lens: jnp.ndarray, temp1: float, temp2: float,
                 temp3: float) -> jnp.ndarray:
    b, d, h, w = img_features.shape
    m = h * w
    t = words_emb.shape[-1]
    ctx = img_features.reshape(b, d, m).astype(jnp.bfloat16)
    # flatten texts along lanes: [1, D, B*T], text i at lanes [i*T, (i+1)*T)
    words = words_emb.astype(jnp.bfloat16).transpose(1, 0, 2) \
        .reshape(1, d, b * t)

    kernel = functools.partial(_sim_kernel, temp1=temp1, temp2=temp2,
                               temp3=temp3, num_texts=b, t=t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),                            # one cell per image
        in_specs=[
            pl.BlockSpec((1, d, m), lambda bi, cap: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, b * t), lambda bi, cap: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, b), lambda bi, cap: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * b * m * t * d,
            bytes_accessed=b * d * m * 2 + b * d * t * 2 + b * b * 4,
            transcendentals=b * b * m * t),
    )(cap_lens.astype(jnp.int32), ctx, words)
    return out[:, 0, :]


def _sim_xla(img_features, words_emb, cap_lens, temp1, temp2, temp3):
    """Identical math in plain XLA (used for the custom-vjp backward)."""
    from medmoe_tpu.ops.losses import attention_fn, cosine_similarity

    b, d, h, w = img_features.shape
    t = words_emb.shape[-1]
    context = img_features.reshape(b, d, h * w)
    word_mask = jnp.arange(t)[None, :] < cap_lens[:, None]
    wei, _ = attention_fn(words_emb, context, temp1, word_mask)
    row = cosine_similarity(words_emb[:, None], wei, axis=2) * temp2
    row = jnp.where(word_mask[:, None, :], jnp.exp(row), 0.0)
    sim = jnp.log(jnp.sum(row, axis=-1)) * temp3        # [text, img]
    return sim.T


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gloria_similarity_pallas(img_features, words_emb, cap_lens,
                             temp1=4.0, temp2=5.0, temp3=10.0):
    """[B_img, B_text] GLoRIA similarity matrix, Pallas forward + XLA-remat
    backward."""
    return _sim_forward(img_features, words_emb, cap_lens, temp1, temp2,
                        temp3)


def _fwd(img_features, words_emb, cap_lens, temp1, temp2, temp3):
    out = _sim_forward(img_features, words_emb, cap_lens, temp1, temp2,
                       temp3)
    return out, (img_features, words_emb, cap_lens)


def _bwd(temp1, temp2, temp3, residuals, g):
    img_features, words_emb, cap_lens = residuals
    _, vjp = jax.vjp(
        lambda im, wo: _sim_xla(im, wo, cap_lens, temp1, temp2, temp3),
        img_features, words_emb)
    d_img, d_words = vjp(g)
    return d_img, d_words, None


gloria_similarity_pallas.defvjp(_fwd, _bwd)
