"""Modality-routed Mixture-of-Experts multi-scale fusion — the MedMoE core.

Re-designs the reference's MoE block (reference
src/models/components/swin.py:11-117) for TPU:

  * ``Expert``: per-scale 1×1 projection (+ReLU) to a common dim, linear
    interpolation of every scale to the largest patch count, cross-scale
    attention (MLP → softmax over scales), weighted sum. Identical math to
    reference swin.py:32-80, but batched over scales/experts with einsums and
    *static* interpolation gather indices (torch F.interpolate
    align_corners=False semantics reproduced exactly).

  * ``MoE`` routing: router MLP(768→128→K) on the mean-pooled final hidden
    state, softmax, **top-1 argmax** (reference swin.py:94-108). The reference
    computes ALL K experts densely then indexes the chosen one. Because the
    chosen output never multiplies the router probability, top-1 selection
    commutes with the expert computation — so the TPU-native default
    (``mode='gather'``) gathers each sample's expert parameters and computes
    only the selected expert: bitwise-equal outputs and gradients at 1/K the
    FLOPs and memory.

  Modes:
    * ``gather``  — per-sample parameter gather; exact parity, K× cheaper.
                    Default on a single chip.
    * ``dense``   — literal all-experts-then-select (reference-shaped);
                    kept for validation and as the EP building block.
    * ``ep``      — expert-parallel: ``dense`` math with the stacked expert
                    axis sharded over the mesh 'expert' axis; the one-hot
                    combine contracts the expert axis so XLA inserts the
                    psum over ICI. Per-device compute = (K/n_expert_shards)·B.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct


@struct.dataclass
class MoEConfig:
    num_experts: int = 6
    hidden_dims: Tuple[int, ...] = (96, 192, 384, 768)
    output_dim: int = 768
    router_input_dim: int = 768
    router_hidden_dim: int = 128
    mode: str = "gather"            # gather | dense | ep
    dtype: jnp.dtype = jnp.bfloat16


def linear_interp_matrix(src_len: int, dst_len: int) -> np.ndarray:
    """Static [src_len, dst_len] matrix reproducing
    torch.nn.functional.interpolate(mode='linear', align_corners=False).

    y[j] = (1-w_j)·x[lo_j] + w_j·x[hi_j] with
    in_coord = (j + 0.5)·(src/dst) - 0.5, clamped to [0, src-1].
    Expressed as a matrix so interpolation becomes one (tiny) matmul that
    fuses into the surrounding einsums on the MXU.
    """
    scale = src_len / dst_len
    coord = (np.arange(dst_len) + 0.5) * scale - 0.5
    coord = np.clip(coord, 0.0, src_len - 1)
    lo = np.floor(coord).astype(np.int64)
    hi = np.minimum(lo + 1, src_len - 1)
    w = (coord - lo).astype(np.float32)
    mat = np.zeros((src_len, dst_len), dtype=np.float32)
    mat[lo, np.arange(dst_len)] += 1.0 - w
    mat[hi, np.arange(dst_len)] += w
    return mat


class ExpertBank(nn.Module):
    """All K experts' parameters, stacked with a leading expert axis.

    Stacked layout is what makes every mode a single einsum family:
    gather-mode indexes axis 0 per sample, dense/ep modes contract it.
    """

    config: MoEConfig

    def setup(self):
        cfg = self.config
        k, d_out = cfg.num_experts, cfg.output_dim
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros

        self.proj_w = [
            self.param(f"proj_w{s}", init, (k, d_s, d_out), jnp.float32)
            for s, d_s in enumerate(cfg.hidden_dims)
        ]
        self.proj_b = [
            self.param(f"proj_b{s}", zeros, (k, d_out), jnp.float32)
            for s in range(len(cfg.hidden_dims))
        ]
        h = d_out // 2
        self.attn_w1 = self.param("attn_w1", init, (k, d_out, h), jnp.float32)
        self.attn_b1 = self.param("attn_b1", zeros, (k, h), jnp.float32)
        self.attn_w2 = self.param("attn_w2", init, (k, h, 1), jnp.float32)
        self.attn_b2 = self.param("attn_b2", zeros, (k, 1), jnp.float32)

    # ---- gather mode: params indexed per sample ------------------------
    def apply_gathered(self, pyramid: Sequence[jnp.ndarray],
                       expert_idx: jnp.ndarray) -> jnp.ndarray:
        """pyramid[s]: [B, P_s, D_s]; expert_idx: [B] int32 → [B, P, D]."""
        cfg = self.config
        dt = cfg.dtype
        p_max = max(f.shape[1] for f in pyramid)

        scale_feats = []
        for s, feats in enumerate(pyramid):
            w = jnp.take(self.proj_w[s], expert_idx, axis=0).astype(dt)  # [B,Ds,E]
            b = jnp.take(self.proj_b[s], expert_idx, axis=0).astype(dt)  # [B,E]
            h = jnp.einsum("bpd,bde->bpe", feats.astype(dt), w,
                           preferred_element_type=jnp.float32)
            h = jax.nn.relu(h + b[:, None, :].astype(jnp.float32)).astype(dt)
            interp = jnp.asarray(linear_interp_matrix(feats.shape[1], p_max),
                                 dtype=dt)
            h = jnp.einsum("bpe,pq->bqe", h, interp,
                           preferred_element_type=jnp.float32).astype(dt)
            scale_feats.append(h)

        stacked = jnp.stack(scale_feats, axis=2)            # [B, P, S, E]
        w1 = jnp.take(self.attn_w1, expert_idx, axis=0).astype(dt)
        b1 = jnp.take(self.attn_b1, expert_idx, axis=0).astype(dt)
        w2 = jnp.take(self.attn_w2, expert_idx, axis=0).astype(dt)
        b2 = jnp.take(self.attn_b2, expert_idx, axis=0).astype(dt)
        a = jnp.einsum("bpse,beh->bpsh", stacked, w1,
                       preferred_element_type=jnp.float32)
        a = jax.nn.relu(a + b1[:, None, None, :].astype(jnp.float32)).astype(dt)
        logits = jnp.einsum("bpsh,bho->bpso", a, w2,
                            preferred_element_type=jnp.float32)
        logits = (logits + b2[:, None, None, :].astype(jnp.float32))[..., 0]
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)   # [B, P, S]
        return jnp.einsum("bpse,bps->bpe", stacked, attn,
                          preferred_element_type=jnp.float32)  # [B, P, E] f32

    # ---- dense / ep mode: all experts, one-hot combine ------------------
    def apply_dense(self, pyramid: Sequence[jnp.ndarray],
                    expert_idx: jnp.ndarray) -> jnp.ndarray:
        """Computes every expert then contracts the expert axis with a one-hot
        (reference swin.py:105-108 shape). Under 'ep' the stacked axis k is
        sharded over the mesh 'expert' axis and XLA turns the contraction
        into a psum over ICI."""
        cfg = self.config
        dt = cfg.dtype
        k = cfg.num_experts
        p_max = max(f.shape[1] for f in pyramid)
        onehot = jax.nn.one_hot(expert_idx, k, dtype=dt)    # [B, K]

        scale_feats = []
        for s, feats in enumerate(pyramid):
            h = jnp.einsum("bpd,kde->kbpe", feats.astype(dt),
                           self.proj_w[s].astype(dt),
                           preferred_element_type=jnp.float32)
            h = jax.nn.relu(h + self.proj_b[s][:, None, None, :]).astype(dt)
            interp = jnp.asarray(linear_interp_matrix(feats.shape[1], p_max),
                                 dtype=dt)
            h = jnp.einsum("kbpe,pq->kbqe", h, interp,
                           preferred_element_type=jnp.float32).astype(dt)
            scale_feats.append(h)

        stacked = jnp.stack(scale_feats, axis=3)            # [K, B, P, S, E]
        a = jnp.einsum("kbpse,keh->kbpsh", stacked, self.attn_w1.astype(dt),
                       preferred_element_type=jnp.float32)
        a = jax.nn.relu(a + self.attn_b1[:, None, None, None, :]).astype(dt)
        logits = jnp.einsum("kbpsh,kho->kbpso", a, self.attn_w2.astype(dt),
                            preferred_element_type=jnp.float32)
        logits = (logits + self.attn_b2[:, None, None, None, :])[..., 0]
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)   # [K, B, P, S]
        fused = jnp.einsum("kbpse,kbps->kbpe", stacked, attn,
                           preferred_element_type=jnp.float32).astype(dt)
        # one-hot select (contracts k → psum over the 'expert' axis under ep)
        return jnp.einsum("bk,kbpe->bpe", onehot, fused,
                          preferred_element_type=jnp.float32)


class MoE(nn.Module):
    """Router + expert bank. Returns (global_feat, local_feat, router_probs)
    exactly like the reference MoE.forward (swin.py:94-117):
      global_feat  [B, D]        mean over patches
      local_feat   [B, D, H, W]  H = W = sqrt(P) (56 for Swin-T @224)
      router_probs [B, K]        softmax(router logits) — NOTE the reference
                                 calls this 'router_logits' but it has already
                                 been softmaxed (swin.py:99); the classifier
                                 CE is applied on top of it. Preserved as-is.
    """

    config: MoEConfig

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray], router_feat: jnp.ndarray):
        cfg = self.config
        x = nn.Dense(cfg.router_hidden_dim, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="router_fc1")(
            router_feat.astype(jnp.float32))
        x = jax.nn.relu(x)
        logits = nn.Dense(cfg.num_experts, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="router_fc2")(x)
        router_probs = jax.nn.softmax(logits, axis=-1)       # [B, K]
        top_expert = jnp.argmax(router_probs, axis=-1)       # [B]

        bank = ExpertBank(cfg, name="experts")
        if cfg.mode == "gather":
            fused = bank.apply_gathered(pyramid, top_expert)
        elif cfg.mode in ("dense", "ep"):
            fused = bank.apply_dense(pyramid, top_expert)
        else:
            raise ValueError(f"unknown moe mode {cfg.mode!r}")

        b, p, d = fused.shape
        hw = int(round(p ** 0.5))
        global_feat = jnp.mean(fused, axis=1)                        # [B, D]
        local_feat = fused.transpose(0, 2, 1).reshape(b, d, hw, hw)  # [B,D,H,W]
        return global_feat, local_feat, router_probs
