"""Pretrained-weight conversion: HF/MedCLIP torch checkpoints → flax params.

Covers the reference's initialization paths:
  * HF ``microsoft/swin-tiny-patch4-window7-224`` → SwinBackbone
    (reference swin.py:124-126);
  * HF ``emilyalsentzer/Bio_ClinicalBERT`` → BertModel
    (reference text_encoder.py:18-22);
  * MedCLIP ``pytorch_model.bin`` with the reference's key remapping:
    'vision_model.' → vision tower, 'text_model.' → text tower
    (reference med_moe.py:40-62).

Torch is used ONLY host-side to read the pickle; all arrays become numpy
then jnp. Conversion is name-driven against OUR parameter tree layout
(see swin.py / bert.py module names), with layout fixes:
  * torch Linear [out, in] → flax kernel [in, out] (transpose);
  * torch Conv2d [out, in, kh, kw] → flax [kh, kw, in, out];
  * LayerNorm weight/bias → scale/bias.

Everything is gated on the checkpoint file existing (this image has no
network egress; random init otherwise — reference prints the same WARNING
and continues, med_moe.py:48).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


#: torch state-dict entries that carry no learnable weights — static buffers
#: our modules recompute at trace time (swin.py:_relative_position_index,
#: bert.py position iota) and HF-version-dependent registered buffers.
#: Everything else in a checkpoint MUST be consumed by the conversion.
IGNORABLE_KEY_SUFFIXES = (
    ".relative_position_index",      # Swin static index buffer
    ".position_ids",                 # BERT arange buffer (older HF versions)
    "embeddings.mask_token",         # Swin MIM token (use_mask_token only)
)


def _is_ignorable(key: str) -> bool:
    """The ONE spelling of the ignore rule — unconsumed-key tracking and
    the out-of-prefix check must never diverge on what counts as a weight."""
    return any(key.endswith(s) or key == s.lstrip(".")
               for s in IGNORABLE_KEY_SUFFIXES)


class TrackedStateDict(dict):
    """State dict that records which keys the conversion actually read, so
    callers can assert no checkpoint weight was silently dropped (the
    reference loads with strict=False, med_moe.py:44 — we keep that
    behavior for MISSING keys but surface UNCONSUMED ones)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def unconsumed(self):
        return sorted(k for k in self
                      if k not in self.consumed and not _is_ignorable(k))


def _report_unconsumed(keys, what: str, strict: bool) -> None:
    if not keys:
        return
    msg = (f"convert: {len(keys)} {what} checkpoint keys were NOT "
           f"consumed by the remap (first 10): {keys[:10]}")
    if strict:
        raise ValueError(msg)
    log.warning(msg)


def _check_coverage(sd: "TrackedStateDict", what: str,
                    strict: bool) -> None:
    _report_unconsumed(sd.unconsumed(), what, strict)


def _linear(sd, prefix):
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _layernorm(sd, prefix):
    return {"LayerNorm_0": {"scale": sd[f"{prefix}.weight"],
                            "bias": sd[f"{prefix}.bias"]}}


def convert_hf_swin(sd: Dict[str, np.ndarray],
                    depths=(2, 2, 6, 2)) -> Dict[str, Any]:
    """HF SwinModel state dict → SwinBackbone params tree."""
    p: Dict[str, Any] = {}
    pre = "swin." if any(k.startswith("swin.") for k in sd) else ""

    emb = f"{pre}embeddings"
    p["patch_embed"] = {
        "proj": {"kernel": sd[f"{emb}.patch_embeddings.projection.weight"]
                 .transpose(2, 3, 1, 0),
                 "bias": sd[f"{emb}.patch_embeddings.projection.bias"]},
        "norm": _layernorm(sd, f"{emb}.norm"),
    }

    for stage in range(len(depths)):
        for blk in range(depths[stage]):
            hf = f"{pre}encoder.layers.{stage}.blocks.{blk}"
            att = f"{hf}.attention"
            p[f"stage{stage}_block{blk}"] = {
                "norm1": _layernorm(sd, f"{hf}.layernorm_before"),
                "attn": {
                    # 1:1 with HF Swin's separate q/k/v projections
                    "query": _linear(sd, f"{att}.self.query"),
                    "key": _linear(sd, f"{att}.self.key"),
                    "value": _linear(sd, f"{att}.self.value"),
                    "proj": _linear(sd, f"{att}.output.dense"),
                    "relative_position_bias_table":
                        sd[f"{att}.self.relative_position_bias_table"],
                },
                "norm2": _layernorm(sd, f"{hf}.layernorm_after"),
                "mlp": {
                    "fc1": _linear(sd, f"{hf}.intermediate.dense"),
                    "fc2": _linear(sd, f"{hf}.output.dense"),
                },
            }
        ds = f"{pre}encoder.layers.{stage}.downsample"
        if f"{ds}.reduction.weight" in sd:
            p[f"stage{stage}_downsample"] = {
                "norm": _layernorm(sd, f"{ds}.norm"),
                "reduction": {"kernel": sd[f"{ds}.reduction.weight"].T},
            }

    p["norm"] = _layernorm(sd, f"{pre}layernorm")
    return p


def convert_hf_bert(sd: Dict[str, np.ndarray],
                    num_layers: int = 12) -> Dict[str, Any]:
    """HF BertModel state dict → our BertModel params tree."""
    pre = "bert." if any(k.startswith("bert.") for k in sd) else ""
    e = f"{pre}embeddings"
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": sd[f"{e}.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd[f"{e}.position_embeddings.weight"]},
            "token_type_embeddings": {
                "embedding": sd[f"{e}.token_type_embeddings.weight"]},
            "norm": _layernorm(sd, f"{e}.LayerNorm"),
        },
    }
    for i in range(num_layers):
        hf = f"{pre}encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attention": {
                "query": _linear(sd, f"{hf}.attention.self.query"),
                "key": _linear(sd, f"{hf}.attention.self.key"),
                "value": _linear(sd, f"{hf}.attention.self.value"),
            },
            "attention_output": _linear(sd, f"{hf}.attention.output.dense"),
            "attention_norm": _layernorm(sd, f"{hf}.attention.output.LayerNorm"),
            "intermediate": _linear(sd, f"{hf}.intermediate.dense"),
            "output": _linear(sd, f"{hf}.output.dense"),
            "output_norm": _layernorm(sd, f"{hf}.output.LayerNorm"),
        }
    if f"{pre}pooler.dense.weight" in sd:
        p["pooler"] = _linear(sd, f"{pre}pooler.dense")
    return p


def _merge_into(params: Dict[str, Any], new: Dict[str, Any],
                path: str = "") -> int:
    """Shape-checked in-place merge; returns #arrays loaded."""
    count = 0
    for k, v in new.items():
        if k not in params:
            log.warning(f"convert: {path}{k} not in model tree — skipped",
                        rank=0)
            continue
        if isinstance(v, dict):
            count += _merge_into(params[k], v, f"{path}{k}.")
        else:
            have = np.asarray(params[k])
            if have.shape != v.shape:
                log.warning(f"convert: shape mismatch at {path}{k}: "
                            f"{have.shape} vs {v.shape} — skipped")
                continue
            params[k] = v.astype(have.dtype)
            count += 1
    return count


def load_medclip_checkpoint(params: Dict[str, Any], checkpoint_path: str,
                            depths=(2, 2, 6, 2), num_layers: int = 12,
                            strict: bool = False) -> Dict[str, Any]:
    """Load a MedCLIP pytorch_model.bin into a full MedMoE params tree
    (reference med_moe.py:40-62 key remapping: vision_model./text_model.).

    Returns a NEW params tree; missing/unmatched keys keep their init
    (strict=False semantics, like the reference). Checkpoint keys the remap
    did NOT consume (beyond known non-weight buffers) are logged — or raise
    with ``strict=True`` — so a layout drift between the checkpoint and the
    converter can't silently drop weights."""
    import jax

    if not (checkpoint_path and os.path.isfile(checkpoint_path)):
        log.warning(f"WARNING: model weights not loaded from "
                    f"{checkpoint_path!r} (file missing)")
        return params
    sd = _load_torch_state_dict(checkpoint_path)

    vision_sd = TrackedStateDict(
        {k[len("vision_model."):]: v for k, v in sd.items()
         if k.startswith("vision_model.")})
    text_sd = TrackedStateDict(
        {k[len("text_model."):]: v for k, v in sd.items()
         if k.startswith("text_model.")})
    # keys under NEITHER tower prefix would otherwise be dropped before
    # the coverage tracking ever sees them (e.g. a checkpoint that grew a
    # logit_scale or projection head at the top level) — same policy as
    # the per-tower leftovers: warn, or raise under strict
    other = [k for k in sd
             if not k.startswith(("vision_model.", "text_model."))
             and not _is_ignorable(k)]
    _report_unconsumed(other, "outside the vision_model./text_model. "
                       "prefixes", strict)

    params = jax.tree_util.tree_map(np.asarray, params)
    n = 0
    if vision_sd:
        swin_params = (params.get("image_encoder", {}).get("swin_moe", {})
                       .get("swin"))
        if swin_params is not None:
            n += _merge_into(swin_params, convert_hf_swin(vision_sd, depths))
            _check_coverage(vision_sd, "vision_model", strict)
    if text_sd:
        bert_params = params.get("text_encoder", {}).get("bert")
        if bert_params is not None:
            n += _merge_into(bert_params,
                             convert_hf_bert(text_sd, num_layers))
            _check_coverage(text_sd, "text_model", strict)
    log.info(f"loaded {n} arrays from {checkpoint_path}")
    return params


def load_hf_pretrained(params: Dict[str, Any],
                       swin_path: Optional[str] = None,
                       bert_path: Optional[str] = None,
                       depths=(2, 2, 6, 2), num_layers: int = 12,
                       strict: bool = False) -> Dict[str, Any]:
    """Load plain HF pytorch_model.bin files (Swin and/or BERT)."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    if swin_path and os.path.isfile(swin_path):
        sd = TrackedStateDict(_load_torch_state_dict(swin_path))
        target = (params.get("image_encoder", {}).get("swin_moe", {})
                  .get("swin"))
        if target is not None:
            n = _merge_into(target, convert_hf_swin(sd, depths))
            _check_coverage(sd, "swin", strict)
            log.info(f"loaded {n} swin arrays from {swin_path}")
    if bert_path and os.path.isfile(bert_path):
        sd = TrackedStateDict(_load_torch_state_dict(bert_path))
        target = params.get("text_encoder", {}).get("bert")
        if target is not None:
            n = _merge_into(target, convert_hf_bert(sd, num_layers))
            _check_coverage(sd, "bert", strict)
            log.info(f"loaded {n} bert arrays from {bert_path}")
    return params
