"""Vision tower facade: backbone factory + (global, local, router) outputs.

Re-implements reference src/models/components/vision_encoder.py +
cnn_backbones.py for TPU. The primary path is Swin-T + MoE (the MedMoE
pretraining tower, reference vision_encoder.py:59-61); a from-scratch ResNet
family covers the reference's CNN backbones (vision_encoder.py:85-104).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from medmoe_tpu.models.moe import MoE, MoEConfig
from medmoe_tpu.models.swin import SwinBackbone, SwinConfig


class SwinMoEVisionTower(nn.Module):
    """SwinBackbone → (pyramid, final) → MoE fusion.

    Mirrors reference SWIN.forward (swin.py:130-149): router feature is the
    mean-pooled final hidden state; pyramid = hidden_states[0..3].
    With ``use_moe=False``: global = mean(final), local = final reshaped to
    a [B, D, 7, 7] grid (the reference returns the raw [B, 49, 768] tokens
    here, a shape its own local loss cannot consume — we return the grid
    form so every downstream consumer works).
    """

    cfg: Any                              # the `vision` DotDict config node

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True):
        dtype = jnp.dtype(self.cfg.get("dtype", "bfloat16"))
        swin_cfg = SwinConfig(
            image_size=int(self.cfg.get("image_size", 224)),
            embed_dim=int(self.cfg.get("swin_embed_dim", 96)),
            depths=tuple(self.cfg.get("swin_depths", (2, 2, 6, 2))),
            num_heads=tuple(self.cfg.get("swin_num_heads", (3, 6, 12, 24))),
            window_size=int(self.cfg.get("swin_window_size", 7)),
            drop_path_rate=float(self.cfg.get("drop_path_rate", 0.1)),
            dtype=dtype)
        pyramid, final = SwinBackbone(swin_cfg, name="swin")(
            pixels, deterministic=deterministic)
        router_feat = jnp.mean(final, axis=1)            # [B, 768]

        if self.cfg.get("use_moe", True):
            moe_cfg = MoEConfig(
                num_experts=int(self.cfg.get("num_experts", 6)),
                hidden_dims=tuple(swin_cfg.stage_dims),
                output_dim=int(self.cfg.get("embed_dim", 768)),
                router_input_dim=swin_cfg.stage_dims[-1],
                mode=str(self.cfg.get("moe_mode", "gather")),
                top_k=int(self.cfg.get("router_top_k", 1)),
                capacity_factor=float(self.cfg.get("capacity_factor", 1.25)),
                dtype=dtype,
            )
            return MoE(moe_cfg, name="moe")(pyramid, router_feat)

        b, p, d = final.shape
        hw = int(round(p ** 0.5))
        global_feat = jnp.mean(final, axis=1)
        local_feat = final.transpose(0, 2, 1).reshape(b, d, hw, hw)
        return global_feat, local_feat, None


class ImageEncoder(nn.Module):
    """Backbone dispatch by ``cfg.model_name`` (reference
    vision_encoder.py:20-28, cnn_backbones.py)."""

    cfg: Any

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True):
        name = self.cfg.get("model_name", "swin")
        if "swin" in name:
            return SwinMoEVisionTower(self.cfg, name="swin_moe")(
                pixels, deterministic=deterministic)
        if "resnet" in name or "resnext" in name:
            from medmoe_tpu.models.resnet import ResNetVisionTower

            return ResNetVisionTower(self.cfg, name="resnet")(
                pixels, deterministic=deterministic)
        if "densenet" in name:
            from medmoe_tpu.models.densenet import DenseNetVisionTower

            return DenseNetVisionTower(self.cfg, name="densenet")(
                pixels, deterministic=deterministic)
        raise ValueError(f"unknown vision backbone {name!r}")
