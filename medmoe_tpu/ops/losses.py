"""Contrastive losses (reference src/losses.py), re-designed for TPU.

Every loss here is a pure function of arrays (wrapped in thin classes so the
``_target_`` config surface matches the reference's loss registry,
reference configs/model/med-moe_pretraining.yaml:29-37).

The headline rewrite is **GLoRIA local**: the reference loops over the batch
in python, building B×B word-region attention maps one caption at a time
(reference losses.py:979-1015, O(B²·T·M) with host-side control flow). Here
it is one batched einsum family over [B_text, B_img, M, T] with caption-length
masking — fully fused by XLA, no host loop, identical numerics (same
softmax/exp/log/temperature ordering).

Dynamic caption lengths become static masks: position t of caption i is valid
iff t < cap_lens[i] (the reference slices `words_emb[i,:,:words_num]`,
losses.py:989 — slicing before a softmax over words ≡ -inf masking).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from medmoe_tpu.ops.softmax import softmax

NEG_INF = -1e30


def safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = True,
              eps: float = 1e-12) -> jnp.ndarray:
    """||x||_2 with the eps floor INSIDE the sqrt: identical values to
    ``maximum(norm, eps)`` (max commutes with the monotone sqrt) but a
    finite gradient at x = 0 — sqrt'(0) is inf, so a clamped-outside norm
    still emits NaN grads for exactly-zero vectors. Zero vectors never
    occur in the reference (it has no capacity dropping) but are routine in
    the MoE dispatched modes, where capacity-overflow samples carry
    exactly-zero fused features."""
    s = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(s, eps * eps))


class GloriaLocalOutput(NamedTuple):
    loss0: jnp.ndarray
    loss1: jnp.ndarray
    att_maps: Optional[jnp.ndarray] = None    # [B, T, H, W] diagonal maps


def _cross_entropy_diag(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean CE with labels = arange(B) (reference's
    ``CrossEntropyLoss()(scores, labels)`` with identity labels).

    The diagonal is read with an eye-mask reduction instead of
    ``jnp.diagonal``: on TPU the gather (and its scatter-add vjp) falls off
    the vector units, while multiply-by-eye + sum is a fused VPU op with a
    multiply-by-eye vjp. Exact: off-diagonal terms are multiplied by 0.0."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    b = logprobs.shape[0]
    eye = jnp.eye(b, dtype=logprobs.dtype)
    return -jnp.sum(logprobs * eye) / b


def attention_fn(words: jnp.ndarray, context: jnp.ndarray, temp1: float,
                 word_mask: Optional[jnp.ndarray] = None):
    """GLoRIA word-region attention (reference losses.py:698-736), batched
    over (text, image) pairs.

    words:   [Bt, D, T]   word (query) embeddings
    context: [Bi, D, M]   flattened image region embeddings
    word_mask: [Bt, T] bool, True = valid word position
    Returns (wei_context [Bt, Bi, D, T], attn [Bt, Bi, T, M]).

    Double softmax exactly as the reference: first over words T (restricted
    to valid words), then over regions M scaled by temp1. Both softmaxes
    store bf16 backward residuals — at the flagship B=32/M=3136 shapes the
    f32 residuals are 2 × 321 MB re-read several times in backward
    (medmoe_tpu/ops/softmax.py; MEDMOE_SOFTMAX_RES=f32 for A/B).
    """
    # raw scores s[i, b, m, t] = <context[b,:,m], words[i,:,t]>
    scores = jnp.einsum("bdm,idt->ibmt", context, words,
                        preferred_element_type=jnp.float32)
    if word_mask is not None:
        scores = jnp.where(word_mask[:, None, None, :], scores, NEG_INF)
    attn = softmax(scores, -1)                             # over words T
    attn = softmax(attn * temp1, -2)                       # over regions M
    wei_context = jnp.einsum("bdm,ibmt->ibdt", context,
                             attn.astype(context.dtype),
                             preferred_element_type=jnp.float32)
    return wei_context, attn.transpose(0, 1, 3, 2)         # [i, b, t, m]


def cosine_similarity(x1: jnp.ndarray, x2: jnp.ndarray, axis: int,
                      eps: float = 1e-8) -> jnp.ndarray:
    """reference losses.py:690-695 (clamped-denominator cosine)."""
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    w12 = jnp.sum(x1 * x2, axis=axis)
    w1 = safe_norm(x1, axis=axis, keepdims=False)
    w2 = safe_norm(x2, axis=axis, keepdims=False)
    return w12 / jnp.maximum(w1 * w2, eps)


def auto_text_chunk(b: int, m: int, t: int,
                    budget_bytes: int = 2 << 30,
                    n_texts: Optional[int] = None) -> Optional[int]:
    """Largest caption-block size whose rematerialized backward stays under
    a peak-activation budget — None when ALL texts fit, so small batches
    skip the lax.map chunk loop entirely (the loop serializes its
    iterations on device; at B=32 the unchunked peak is ~0.3 GB and the
    loop was pure overhead, ~15% of the train step on v5e). At B=256 this
    resolves to 8, the hand-tuned round-1 value.

    ``b`` is the IMAGE count (peak memory scales with the [c, B_img, M, T]
    block); ``n_texts`` is the chunked axis' length when it differs —
    rectangular under shard_map, where per-shard images see the replicated
    global text batch. The whole-batch early exit and the divisibility
    search both run against the TEXT count."""
    n_texts = b if n_texts is None else n_texts
    per_text = b * m * t * 4 * 3     # scores+attn+cotangents resident in vjp
    chunk = max(1, int(budget_bytes // per_text))
    if chunk >= n_texts:
        return None
    for c in range(chunk, 0, -1):
        if n_texts % c == 0:
            return c
    return 1


def gloria_local_loss(img_features: jnp.ndarray, words_emb: jnp.ndarray,
                      cap_lens: jnp.ndarray, temp1: float = 4.0,
                      temp2: float = 5.0, temp3: float = 10.0,
                      agg: str = "sum", return_att_maps: bool = False,
                      text_chunk: Any = "auto") -> GloriaLocalOutput:
    """Batched GLoRIA local (word-region) contrastive loss.

    img_features: [B, D, H, W]; words_emb: [B, D, T]; cap_lens: [B] int.
    Matches reference GLORIALocalContrastiveLoss.forward (losses.py:961-1026):
    similarities[b_img, i_text] = temp3 · log Σ_{t<cap_len_i} exp(temp2 ·
    cos(word, attended_context)); symmetric CE on the B×B matrix.

    ``text_chunk`` bounds peak memory: the [Bt, Bi, M, T] attention tensor is
    built for ``text_chunk`` captions at a time under a lax.map +
    jax.checkpoint (rematerialized in backward) — identical numerics, peak
    activation memory reduced by B/text_chunk. None → single fused pass.
    """
    b, d, h, w = img_features.shape
    t = words_emb.shape[-1]
    if text_chunk == "auto":
        text_chunk = auto_text_chunk(b, h * w, t)
    context = img_features.reshape(b, d, h * w)
    word_mask = jnp.arange(t)[None, :] < cap_lens[:, None]     # [B, T]

    def sim_block(words_c, mask_c, lens_c):
        """words_c [c, D, T], mask_c [c, T] → sim [c, B]."""
        wei_context, attn = attention_fn(words_c, context, temp1, mask_c)
        row_sim = cosine_similarity(words_c[:, None], wei_context, axis=2)
        row_sim = row_sim * temp2
        row_sim = jnp.where(mask_c[:, None, :], jnp.exp(row_sim), 0.0)
        if agg == "sum":
            s = jnp.sum(row_sim, axis=-1)                      # [c, B]
        else:
            s = jnp.sum(row_sim, axis=-1) / jnp.maximum(lens_c[:, None], 1)
        return jnp.log(s) * temp3, attn

    if text_chunk and b > text_chunk and b % text_chunk == 0 \
            and not return_att_maps:
        nc = b // text_chunk
        wc = words_emb.reshape(nc, text_chunk, d, t)
        mc = word_mask.reshape(nc, text_chunk, t)
        lc = cap_lens.reshape(nc, text_chunk)
        blocks = jax.lax.map(
            jax.checkpoint(lambda args: sim_block(*args)[0]), (wc, mc, lc))
        sim = blocks.reshape(b, b)                             # [i, b]
        attn = None
    else:
        sim, attn = sim_block(words_emb, word_mask, cap_lens)

    # reference layout: similarities[b_img, i_text]
    similarities = sim.T                                       # [b, i]
    loss0 = _cross_entropy_diag(similarities)
    loss1 = _cross_entropy_diag(similarities.T)
    att_maps = None
    if return_att_maps and attn is not None:
        diag = jnp.einsum("iitm->itm", attn)                   # [B, T, M]
        att_maps = diag.reshape(b, t, h, w)
    return GloriaLocalOutput(loss0=loss0, loss1=loss1, att_maps=att_maps)


def gloria_global_loss(cnn_code: jnp.ndarray, rnn_code: jnp.ndarray,
                       temp3: float = 10.0, eps: float = 1e-8) -> jnp.ndarray:
    """Batch cosine-similarity InfoNCE (reference
    GLORIAGlobalContrastiveLoss.forward, losses.py:766-794)."""
    cnn = cnn_code.astype(jnp.float32)
    rnn = rnn_code.astype(jnp.float32)
    scores = cnn @ rnn.T
    norms = safe_norm(cnn) @ safe_norm(rnn).T
    scores = scores / jnp.maximum(norms, eps) * temp3
    return _cross_entropy_diag(scores) + _cross_entropy_diag(scores.T)


def clip_contrastive_loss(img: jnp.ndarray, txt: jnp.ndarray,
                          logit_scale: jnp.ndarray,
                          axis_name: Optional[str] = None) -> jnp.ndarray:
    """FLAVA/CLIP-style InfoNCE with learnable temperature and optional
    cross-device global negatives (reference losses.py:248-301 + 503-592 +
    src/utils/distributed.py backprop-all_gather).

    Under SPMD, ``lax.all_gather`` over the data axis is differentiable by
    construction — this one line replaces the reference's
    torch.distributed.nn.functional.all_gather machinery.
    """
    img = img / safe_norm(img)
    txt = txt / safe_norm(txt)
    temp = jnp.exp(jnp.clip(logit_scale, None, jnp.log(100.0)))
    local_b = img.shape[0]
    if axis_name is not None:
        all_img = jax.lax.all_gather(img, axis_name, tiled=True)
        all_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        offset = jax.lax.axis_index(axis_name) * local_b
    else:
        all_img, all_txt, offset = img, txt, 0
    logits_i = (img @ all_txt.T).astype(jnp.float32) * temp
    logits_t = (txt @ all_img.T).astype(jnp.float32) * temp
    labels = offset + jnp.arange(local_b)
    lp_i = jax.nn.log_softmax(logits_i, axis=-1)
    lp_t = jax.nn.log_softmax(logits_t, axis=-1)
    # one-hot select (TPU: gather/scatter-free label pick, exact)
    onehot = jax.nn.one_hot(labels, lp_i.shape[1], dtype=lp_i.dtype)
    loss_i = -jnp.mean(jnp.sum(lp_i * onehot, axis=1))
    loss_t = -jnp.mean(jnp.sum(lp_t * onehot, axis=1))
    return (loss_i + loss_t) / 2.0


def soft_xent(target: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """reference softXEnt (losses.py:796-803)."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(target * logprobs) / logits.shape[0]


def soft_xent_penalty(target: jnp.ndarray, logits: jnp.ndarray,
                      penalty: jnp.ndarray) -> jnp.ndarray:
    """reference softXEntPenalty (losses.py:805-812): per-element penalty
    weighting inside the soft CE."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(target * logprobs * penalty) / logits.shape[0]


def hard_negative_loss(imgs: jnp.ndarray, caps: jnp.ndarray, nmax: int = 1,
                       margin: float = 0.2) -> jnp.ndarray:
    """Margin loss over the nmax hardest negatives (reference
    HardNegativeContrastiveLoss, losses.py:885-927)."""
    imgs = imgs / safe_norm(imgs)
    caps = caps / safe_norm(caps)
    scores = (imgs @ caps.T).astype(jnp.float32)
    eye = jnp.eye(scores.shape[0], dtype=scores.dtype)
    diag = jnp.sum(scores * eye, axis=1)        # gather-free diagonal read
    scores = scores - 2.0 * scores * eye        # == scores - 2·diag(diag)
    top_c = jax.lax.top_k(scores.T, nmax)[0].T               # [nmax, B]
    top_i = jax.lax.top_k(scores, nmax)[0]                   # [B, nmax]
    neg_cap = jnp.sum(jnp.maximum(top_c + (margin - diag)[None, :], 0.0))
    neg_img = jnp.sum(jnp.maximum(top_i + (margin - diag)[:, None], 0.0))
    return neg_cap + neg_img


def router_classification_loss(router_probs: jnp.ndarray,
                               labels: jnp.ndarray) -> jnp.ndarray:
    """CE applied on top of ALREADY-SOFTMAXED router outputs — preserving the
    reference quirk (swin.py:99 softmaxes, medmoe_module.py:305 then applies
    F.cross_entropy on the result, i.e. a double softmax)."""
    logprobs = jax.nn.log_softmax(router_probs.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, logprobs.shape[-1], dtype=logprobs.dtype)
    return -jnp.mean(jnp.sum(logprobs * onehot, axis=1))


def router_accuracy(router_probs: jnp.ndarray, labels: jnp.ndarray
                    ) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(router_probs, axis=-1) == labels)
                    .astype(jnp.float32))


# --------------------------------------------------------------------------
# Config-surface loss classes (the _target_ registry the reference exposes)
# --------------------------------------------------------------------------

class GLORIAGlobalContrastiveLoss:
    def __call__(self, cnn_code, rnn_code, temp3=10.0, scores=None, thresholds=None):
        return gloria_global_loss(cnn_code, rnn_code, temp3)


class ZEROGlobalContrastiveLoss:
    """Ablation stub returning 0 (reference losses.py:740-755)."""

    def __call__(self, cnn_code, rnn_code, temp3=10.0, scores=None, thresholds=None):
        return jnp.asarray(0.0)


class HardNegativeContrastiveLoss:
    def __init__(self, nmax: int = 1, margin: float = 0.2):
        self.nmax = nmax
        self.margin = margin

    def __call__(self, imgs, caps, temp3=10.0, scores=None, thresholds=None):
        return hard_negative_loss(imgs, caps, self.nmax, self.margin)


class GLORIALocalContrastiveLoss:
    """impl='auto' (default): picks the faster path by per-device batch.

    Small batches (B≤64, the unchunked-XLA regime): plain batched einsums —
    XLA stores the [B,B,M,T] attention residuals in forward and reuses them
    in backward, beating the Pallas kernels even after their backward
    became recompute-in-VMEM kernels too (5.67 vs 7.34 ms fwd+bwd isolated
    at B=32, M=361 on v5e — storing residuals beats recomputing them while
    everything fits). Round-4 re-check at the FLAGSHIP local-feature size
    (M=3136 — the pyramid is upsampled to 56×56, not GLoRIA's 19×19):
    the full B=32 train step measures 63.28 ms with this XLA path vs
    67.82 ms with the kernel forced (scripts/bench_step_variants.py
    predecessor run, docs/PERFORMANCE.md round 4) — the threshold holds at
    the real shapes, not just the calibration ones.

    Large batches (B>64): the fused Pallas similarity kernel
    (medmoe_tpu/ops/pallas/gloria_attention.py — the [M,T] attention never
    leaves VMEM; measured 248 ms vs 332-448 ms XLA-chunked at B=256 on
    v5e, where unchunked XLA OOMs outright).

    impl='xla'/'pallas' force a path; MEDMOE_GLORIA_IMPL overrides."""

    def __init__(self, text_chunk: Any = "auto", impl: str = "auto"):
        self.text_chunk = text_chunk
        self.impl = impl

    def _resolve_impl(self, agg: str, batch: int) -> str:
        import os

        impl = os.environ.get("MEDMOE_GLORIA_IMPL", self.impl)
        if impl == "auto":
            import jax

            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            # the kernel computes the reference's default agg='sum' only,
            # and only pays off once the stored-residual XLA path no longer
            # fits (auto_text_chunk starts chunking beyond B=64)
            impl = "pallas" if (on_tpu and agg == "sum" and batch > 64) \
                else "xla"
        return impl

    def __call__(self, img_features, words_emb, cap_lens, temp1=4.0,
                 temp2=5.0, temp3=10.0, agg="sum", scores=None, thresholds=None):
        if self._resolve_impl(agg, img_features.shape[0]) == "pallas":
            from medmoe_tpu.ops.pallas.gloria_attention import \
                gloria_similarity_pallas

            similarities = gloria_similarity_pallas(
                img_features, words_emb, cap_lens, temp1, temp2, temp3)
            loss0 = _cross_entropy_diag(similarities)
            loss1 = _cross_entropy_diag(similarities.T)
            return GloriaLocalOutput(loss0=loss0, loss1=loss1)
        return gloria_local_loss(img_features, words_emb, cap_lens,
                                 temp1, temp2, temp3, agg,
                                 text_chunk=self.text_chunk)


class ZEROLocalContrastiveLoss:
    def __call__(self, img_features, words_emb, cap_lens, temp1=4.0,
                 temp2=5.0, temp3=10.0, agg="sum", scores=None, thresholds=None):
        zero = jnp.asarray(0.0)
        return GloriaLocalOutput(loss0=zero, loss1=zero)


class SoftGLORIAGlobalContrastiveLoss:
    """SAT-style soft-label global loss (reference losses.py:814-883):
    text-similarity scores partition positives/negatives per anchor; each
    positive is scored against the shared negative set with a soft CE.

    The reference's per-anchor python loops become masked matrix ops: for
    anchor a, positive j (sim > thr_pos) and negatives N (sim <= thr_neg),
    loss contribution = -log_softmax([s_aj; s_aN])[0]-style soft CE, averaged
    over positives then anchors.
    """

    def __call__(self, cnn_code, rnn_code, temp3=10.0, scores=None, thresholds=None):
        scores_text = scores                # [B, B] tool-BERT text similarity
        thr_pos, thr_neg = thresholds
        b = cnn_code.shape[0]
        cnn = cnn_code.astype(jnp.float32)
        rnn = rnn_code.astype(jnp.float32)
        s = cnn @ rnn.T
        norms = safe_norm(cnn) @ safe_norm(rnn).T
        s = s / jnp.maximum(norms, 1e-8) * temp3            # scores0 [B,B]

        pos_mask = scores_text > thr_pos                     # [B(anchor), B]
        neg_mask = scores_text <= thr_neg

        def one_direction(sc):
            # For anchor a and candidate positive j: soft CE over the vector
            # [sc[a, j]; sc[a, negs]] with one-hot target on position 0 ≡
            # reference softXEnt(targets, cat([pos, negs])), which divides by
            # the cat length (1 + n_neg).
            neg = jnp.where(neg_mask, sc, NEG_INF)           # [B, B]
            m = jnp.maximum(sc, jnp.max(neg, axis=1)[:, None])
            lse = jnp.log(
                jnp.exp(sc - m)
                + jnp.sum(jnp.where(neg_mask[:, None, :],
                                    jnp.exp(neg[:, None, :] - m[..., None]),
                                    0.0), axis=-1)) + m
            n_neg = jnp.sum(neg_mask, axis=1)                # [B]
            cat_len = jnp.maximum(1 + n_neg, 1)[:, None]
            per_pos = (lse - sc) / cat_len                   # [B(anchor), B(pos)]
            n_pos = jnp.maximum(jnp.sum(pos_mask, axis=1), 1)
            per_anchor = jnp.sum(jnp.where(pos_mask, per_pos, 0.0),
                                 axis=1) / n_pos
            return jnp.sum(per_anchor) / b

        return one_direction(s) + one_direction(s.T)


class SoftGLORIALocalContrastiveLoss:
    """Soft-label variant of the local loss (reference losses.py:1111-1214):
    the same word-region similarity matrix, but scored with the
    soft-partitioned CE of SoftGLORIAGlobalContrastiveLoss."""

    def __call__(self, img_features, words_emb, cap_lens, temp1=4.0,
                 temp2=5.0, temp3=10.0, agg="sum", scores=None, thresholds=None):
        b, d, h, w = img_features.shape
        t = words_emb.shape[-1]
        context = img_features.reshape(b, d, h * w)
        word_mask = jnp.arange(t)[None, :] < cap_lens[:, None]
        wei_context, _ = attention_fn(words_emb, context, temp1, word_mask)
        row_sim = cosine_similarity(words_emb[:, None], wei_context, axis=2)
        row_sim = jnp.where(word_mask[:, None, :],
                            jnp.exp(row_sim * temp2), 0.0)
        sim = jnp.log(jnp.sum(row_sim, axis=-1)) * temp3     # [text, img]
        similarities = sim.T                                 # [img, text]

        scores_text = scores               # [B, B] tool-BERT text similarity
        thr_pos, thr_neg = thresholds
        pos_mask = scores_text > thr_pos
        neg_mask = scores_text <= thr_neg

        def one_direction(sc):
            neg = jnp.where(neg_mask, sc, NEG_INF)
            m = jnp.maximum(sc, jnp.max(neg, axis=1)[:, None])
            lse = jnp.log(
                jnp.exp(sc - m)
                + jnp.sum(jnp.where(neg_mask[:, None, :],
                                    jnp.exp(neg[:, None, :] - m[..., None]),
                                    0.0), axis=-1)) + m
            n_neg = jnp.sum(neg_mask, axis=1)
            cat_len = jnp.maximum(1 + n_neg, 1)[:, None]
            per_pos = (lse - sc) / cat_len
            n_pos = jnp.maximum(jnp.sum(pos_mask, axis=1), 1)
            per_anchor = jnp.sum(jnp.where(pos_mask, per_pos, 0.0),
                                 axis=1) / n_pos
            return jnp.sum(per_anchor) / sc.shape[0]

        loss0 = one_direction(similarities)
        loss1 = one_direction(similarities.T)
        return GloriaLocalOutput(loss0=loss0, loss1=loss1)
