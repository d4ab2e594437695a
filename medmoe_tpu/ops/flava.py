"""FLAVA-style pretraining losses and heads (reference src/losses.py:27-592).

These are the reference's vendored-torchmultimodal loss family: ITM,
masked-prediction (MLM/MIM/MMM) heads with tied-bias decoders, and the
CLIP-style global contrastive loss with a learnable clamped temperature and
cross-device global negatives. Kept API-compatible with the reference's
loss registry; the MedMoE default path uses the GLoRIA losses instead
(medmoe_tpu/ops/losses.py) but ablation configs can point here.

TPU re-design notes:
  * masked-prediction losses never do data-dependent boolean gathers
    (dynamic shapes) — the CE is computed everywhere and masked, identical
    math to the reference's index-select + CrossEntropyLoss(ignore_index);
  * the global-negatives all_gather is medmoe_tpu.parallel.collectives
    (differentiable by construction = BackpropType.GLOBAL).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from medmoe_tpu.models.layers import Fp32LayerNorm, gelu_exact
from medmoe_tpu.parallel.collectives import BackpropType, gather_tensor


class ITMLossOutput(NamedTuple):
    logits: jnp.ndarray
    loss: jnp.ndarray


class MaskedPredictionLossOutput(NamedTuple):
    logits: jnp.ndarray
    loss: jnp.ndarray


class ContrastiveLossOutput(NamedTuple):
    loss: jnp.ndarray
    logits_a: jnp.ndarray
    logits_b: jnp.ndarray
    loss_a: jnp.ndarray
    loss_b: jnp.ndarray


class FLAVAGlobalContrastiveLossOutput(NamedTuple):
    text_embedding: jnp.ndarray
    image_embedding: jnp.ndarray
    logit_scale: jnp.ndarray
    image_logits: jnp.ndarray
    text_logits: jnp.ndarray
    image_loss: jnp.ndarray
    text_loss: jnp.ndarray
    loss: jnp.ndarray


class Pooler(nn.Module):
    """First-token pool + tanh (reference losses.py:92-104)."""

    hidden_size: int = 768

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        first = hidden_states[:, 0]
        return jnp.tanh(nn.Dense(self.hidden_size, param_dtype=jnp.float32,
                                 name="dense")(first))


class TwoWayHead(nn.Module):
    """2-way ITM classifier (reference losses.py:106-114)."""

    hidden_size: int = 768

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(2, param_dtype=jnp.float32,
                        name="seq_relationship")(pooled)


def _masked_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               ignore_index: int = -1) -> jnp.ndarray:
    """CrossEntropyLoss(ignore_index) without dynamic gathers."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot select: gather/scatter-free label pick (exact — zeros added)
    onehot = jax.nn.one_hot(safe, logprobs.shape[-1], dtype=logprobs.dtype)
    nll = -jnp.sum(logprobs * onehot, axis=-1)
    n = jnp.sum(valid)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(n, 1)


class ITMLoss(nn.Module):
    """Image-text-matching CE (reference losses.py:117-147)."""

    hidden_size: int = 768
    ignore_index: int = -1

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray,
                 labels: Optional[jnp.ndarray]) -> ITMLossOutput:
        pooled = Pooler(self.hidden_size, name="pooler")(hidden_states)
        scores = TwoWayHead(self.hidden_size, name="cls")(pooled)
        if labels is None:
            loss = jnp.sum(pooled) * 0.0
        else:
            loss = _masked_ce(scores, labels, self.ignore_index)
        return ITMLossOutput(logits=scores, loss=loss)


class MaskedPredictionHead(nn.Module):
    """Dense → act → LN → tied-vocab decoder + bias
    (reference losses.py:150-186)."""

    hidden_size: int = 768
    vocab_size: int = 30522
    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size, param_dtype=jnp.float32,
                     name="dense")(hidden_states)
        x = gelu_exact(x)
        x = Fp32LayerNorm(epsilon=self.layer_norm_eps, name="layer_norm")(x)
        x = nn.Dense(self.vocab_size, use_bias=False, param_dtype=jnp.float32,
                     name="decoder")(x)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.vocab_size,), jnp.float32)
        return x + bias


class MaskedPredictionLoss(nn.Module):
    """MLM/MIM CE over masked positions (reference losses.py:189-245).
    ignore_nan guards the all-ignored case like the reference."""

    hidden_size: int = 768
    vocab_size: int = 30522
    ignore_index: int = -1
    ignore_nan: bool = False

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray,
                 masked_labels: Optional[jnp.ndarray]
                 ) -> MaskedPredictionLossOutput:
        prediction = MaskedPredictionHead(
            self.hidden_size, self.vocab_size, name="cls")(hidden_states)
        if masked_labels is None:
            loss = jnp.sum(prediction) * 0.0
        else:
            loss = _masked_ce(prediction, masked_labels, self.ignore_index)
            if self.ignore_nan:
                loss = jnp.nan_to_num(loss)
        return MaskedPredictionLossOutput(logits=prediction, loss=loss)


def contrastive_loss_with_temperature(
        embeddings_a: jnp.ndarray, embeddings_b: jnp.ndarray,
        logit_scale: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
        backprop_type: BackpropType = BackpropType.GLOBAL,
        axis_name: Optional[str] = None) -> ContrastiveLossOutput:
    """CLIP InfoNCE with learnable temperature and global negatives
    (reference losses.py:527-592 + _gather_embeddings_and_labels
    :503-524 with rank-offset labels)."""
    temp = jnp.exp(logit_scale)
    local_b = embeddings_a.shape[0]
    all_a = gather_tensor(embeddings_a, axis_name, backprop_type)
    all_b = gather_tensor(embeddings_b, axis_name, backprop_type)
    if axis_name is not None:
        offset = jax.lax.axis_index(axis_name) * local_b
    else:
        offset = 0
    labels = offset + jnp.arange(local_b)

    logits_a = (embeddings_a @ all_b.T).astype(jnp.float32) * temp
    logits_b = (embeddings_b @ all_a.T).astype(jnp.float32) * temp
    if mask is not None:
        logits_a = jnp.where(mask, logits_a, -jnp.inf)
        logits_b = jnp.where(mask, logits_b, -jnp.inf)

    lp_a = jax.nn.log_softmax(logits_a, axis=-1)
    lp_b = jax.nn.log_softmax(logits_b, axis=-1)
    # one-hot select (TPU: gather/scatter-free label pick, exact)
    onehot = jax.nn.one_hot(labels, lp_a.shape[1], dtype=lp_a.dtype)
    loss_a = -jnp.mean(jnp.sum(lp_a * onehot, axis=1))
    loss_b = -jnp.mean(jnp.sum(lp_b * onehot, axis=1))
    loss = (loss_a + loss_b) / 2.0
    return ContrastiveLossOutput(loss=loss, logits_a=logits_a,
                                 logits_b=logits_b, loss_a=loss_a,
                                 loss_b=loss_b)


class FLAVAGlobalContrastiveLoss(nn.Module):
    """L2-normalize, clamp learnable logit_scale to [0, ln 100], InfoNCE
    (reference losses.py:248-301)."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, image_sequence: jnp.ndarray,
                 text_sequence: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None
                 ) -> FLAVAGlobalContrastiveLossOutput:
        logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(math.log(1.0 / 0.07), jnp.float32))
        logit_scale = jnp.clip(logit_scale, 0.0, 4.6052)
        from medmoe_tpu.ops.losses import safe_norm

        txt = text_sequence / safe_norm(text_sequence)
        img = image_sequence / safe_norm(image_sequence)
        out = contrastive_loss_with_temperature(
            img, txt, logit_scale, mask, BackpropType.GLOBAL, self.axis_name)
        return FLAVAGlobalContrastiveLossOutput(
            text_embedding=txt, image_embedding=img, logit_scale=logit_scale,
            image_logits=out.logits_a, text_logits=out.logits_b,
            image_loss=out.loss_a, text_loss=out.loss_b, loss=out.loss)


class FLAVAPretrainingLoss(nn.Module):
    """Composite MLM + MIM + MMM + ITM + contrastive orchestrator
    (reference losses.py:304-492). Weighted sum of whichever component
    inputs are provided; absent inputs contribute nothing."""

    hidden_size: int = 768
    text_vocab_size: int = 30522
    image_vocab_size: int = 8192
    ignore_index: int = -1
    mlm_weight: float = 1.0
    mim_weight: float = 1.0
    contrastive_loss_weight: float = 1.0
    mmm_image_loss_weight: float = 1.0
    mmm_text_loss_weight: float = 1.0
    itm_loss_weight: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self,
                 image_sequence: Optional[jnp.ndarray] = None,
                 text_sequence: Optional[jnp.ndarray] = None,
                 image_masked_sequence: Optional[jnp.ndarray] = None,
                 text_masked_sequence: Optional[jnp.ndarray] = None,
                 multimodal_masked_sequence: Optional[jnp.ndarray] = None,
                 itm_labels: Optional[jnp.ndarray] = None,
                 mlm_labels: Optional[jnp.ndarray] = None,
                 mim_labels: Optional[jnp.ndarray] = None) -> dict:
        losses: dict[str, Any] = {}
        total = jnp.zeros((), jnp.float32)

        if text_masked_sequence is not None and mlm_labels is not None:
            out = MaskedPredictionLoss(
                self.hidden_size, self.text_vocab_size, self.ignore_index,
                name="mlm_loss")(text_masked_sequence, mlm_labels)
            losses["mlm_loss"] = out.loss
            total = total + self.mlm_weight * out.loss
        if image_masked_sequence is not None and mim_labels is not None:
            out = MaskedPredictionLoss(
                self.hidden_size, self.image_vocab_size, self.ignore_index,
                name="mim_loss")(image_masked_sequence, mim_labels)
            losses["mim_loss"] = out.loss
            total = total + self.mim_weight * out.loss
        if multimodal_masked_sequence is not None and itm_labels is not None:
            out = ITMLoss(self.hidden_size, self.ignore_index,
                          name="itm_loss")(multimodal_masked_sequence,
                                           itm_labels)
            losses["itm_loss"] = out.loss
            total = total + self.itm_loss_weight * out.loss
        if image_sequence is not None and text_sequence is not None:
            out = FLAVAGlobalContrastiveLoss(
                self.axis_name, name="contrastive_loss")(
                image_sequence, text_sequence)
            losses["global_contrastive_loss"] = out.loss
            total = total + self.contrastive_loss_weight * out.loss

        losses["loss"] = total
        return losses
