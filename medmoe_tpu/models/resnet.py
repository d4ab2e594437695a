"""ResNet backbone family with LoRA-capable convolutions.

Re-implements the reference's from-scratch ResNet (src/models/components/
resnet.py: Bottleneck/BasicBlock where every conv can be a LoRA conv) and
the vision-encoder ResNet path (vision_encoder.py:85-104: bilinear upsample
to 299, layer3 output as the local feature map, pooled layer4 as global).

TPU notes: NHWC layout; normalization selectable — 'batch' (torchvision
parity; batch_stats handled by the caller via mutable collections) or
'group' (stateless, the TPU-friendly default for from-scratch training).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from medmoe_tpu.models.lora import LoRAConv


def _norm(norm: str, name: str, use_running_average: bool = True,
          channels: int | None = None):
    """Norm-layer factory. 'group' adapts its group count to the channel
    width — ``gcd(32, channels)`` — so widths that 32 does not divide
    (DenseNet-161's growth-48 maps: 144, 240, …) still compose; every
    ResNet/DenseNet-121/169 width is a multiple of 32, where this is
    exactly GroupNorm(32). The group count never changes the param tree
    (scale/bias are per-channel), so checkpoints are unaffected."""
    if norm == "batch":
        return nn.BatchNorm(use_running_average=use_running_average,
                            momentum=0.9, epsilon=1e-5,
                            param_dtype=jnp.float32, name=name)
    import math

    groups = 32 if channels is None else math.gcd(32, int(channels))
    return nn.GroupNorm(num_groups=groups, param_dtype=jnp.float32,
                        name=name)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    norm: str = "batch"
    lora_r: int = 0
    lora_alpha: int = 16
    expansion: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LoRAConv(self.features, (3, 3), (self.strides, self.strides),
                     r=self.lora_r, alpha=self.lora_alpha, use_bias=False,
                     name="conv1")(x)
        y = _norm(self.norm, "bn1", deterministic)(y)
        y = jax.nn.relu(y)
        y = LoRAConv(self.features, (3, 3), r=self.lora_r,
                     alpha=self.lora_alpha, use_bias=False, name="conv2")(y)
        y = _norm(self.norm, "bn2", deterministic)(y)
        if x.shape != y.shape:
            x = LoRAConv(self.features, (1, 1),
                         (self.strides, self.strides), use_bias=False,
                         name="downsample_conv")(x)
            x = _norm(self.norm, "downsample_bn", deterministic)(x)
        return jax.nn.relu(x + y)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck (reference resnet.py:131-190).

    `groups`/`base_width` follow the torchvision ResNeXt variant the
    reference exposes through its factory (cnn_backbones.py:89-100:
    resnext50_32x4d / resnext101_32x8d); grouped convs carry no LoRA —
    the reference's ResNeXt path is plain torchvision."""

    features: int
    strides: int = 1
    norm: str = "batch"
    lora_r: int = 0
    lora_alpha: int = 16
    expansion: int = 4
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_ch = self.features * self.expansion
        width = int(self.features * self.base_width / 64) * self.groups
        y = LoRAConv(width, (1, 1), r=self.lora_r,
                     alpha=self.lora_alpha, use_bias=False, name="conv1")(x)
        y = _norm(self.norm, "bn1", deterministic)(y)
        y = jax.nn.relu(y)
        if self.groups == 1:
            y = LoRAConv(width, (3, 3), (self.strides, self.strides),
                         r=self.lora_r, alpha=self.lora_alpha, use_bias=False,
                         name="conv2")(y)
        else:
            y = nn.Conv(width, (3, 3), (self.strides, self.strides),
                        padding=((1, 1), (1, 1)),
                        feature_group_count=self.groups, use_bias=False,
                        param_dtype=jnp.float32, name="conv2")(y)
        y = _norm(self.norm, "bn2", deterministic)(y)
        y = jax.nn.relu(y)
        y = LoRAConv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = _norm(self.norm, "bn3", deterministic)(y)
        if x.shape[-1] != out_ch or self.strides != 1:
            x = LoRAConv(out_ch, (1, 1), (self.strides, self.strides),
                         use_bias=False, name="downsample_conv")(x)
            x = _norm(self.norm, "downsample_bn", deterministic)(x)
        return jax.nn.relu(x + y)


class ResNet(nn.Module):
    """Stage layout per torchvision; returns (global_feat, local_feat)
    where local = layer3 output (reference vision_encoder.py:96-100)."""

    block: Any = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    norm: str = "batch"
    lora_r: int = 0
    lora_alpha: int = 16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LoRAConv(64, (7, 7), (2, 2), r=self.lora_r,
                     alpha=self.lora_alpha, use_bias=False, name="conv1")(x)
        y = _norm(self.norm, "bn1", deterministic)(y)
        y = jax.nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        for stage, n_blocks in enumerate(self.layers):
            features = 64 * (2 ** stage)
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                y = self.block(features, strides, self.norm, self.lora_r,
                               self.lora_alpha,
                               name=f"layer{stage + 1}_block{b}")(
                    y, deterministic=deterministic)
            feats.append(y)

        local = feats[2]                              # layer3 output
        global_feat = jnp.mean(feats[3], axis=(1, 2))  # adaptive avg pool 1x1
        # channel-first local map to match the loss contract [B, D, H, W]
        return global_feat, local.transpose(0, 3, 1, 2)


def ResNet18(**kw):
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def ResNet34(**kw):
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def ResNet50(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kw)


def ResNet101(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), **kw)


def ResNet152(**kw):
    return ResNet(block=Bottleneck, layers=(3, 8, 36, 3), **kw)


def ResNeXt50(**kw):
    """resnext50_32x4d (reference cnn_backbones.py:89-93)."""
    block = functools.partial(Bottleneck, groups=32, base_width=4)
    return ResNet(block=block, layers=(3, 4, 6, 3), **kw)


def ResNeXt101(**kw):
    """resnext101_32x8d (reference cnn_backbones.py:96-100)."""
    block = functools.partial(Bottleneck, groups=32, base_width=8)
    return ResNet(block=block, layers=(3, 4, 23, 3), **kw)


class ResNetVisionTower(nn.Module):
    """ResNet path of the ImageEncoder facade (reference
    vision_encoder.py:85-104): bilinear-resize input to 299×299, run the
    backbone, return (global, local[layer3], None router logits)."""

    cfg: Any

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True):
        name = self.cfg.get("model_name", "resnet_50")
        ctor = {"resnet_18": ResNet18, "resnet_34": ResNet34,
                "resnet_50": ResNet50, "resnet_101": ResNet101,
                "resnet_152": ResNet152, "resnext_50": ResNeXt50,
                "resnext_100": ResNeXt101}.get(name, ResNet50)
        lora_r = int(self.cfg.get("lora_r", 8)) if self.cfg.get("lora", False) \
            else 0
        backbone = ctor(norm=self.cfg.get("norm", "group"),
                        lora_r=lora_r,
                        lora_alpha=int(self.cfg.get("lora_alpha", 16)),
                        name="model")
        x = jax.image.resize(
            pixels, (pixels.shape[0], 299, 299, pixels.shape[-1]),
            method="bilinear")
        global_feat, local_feat = backbone(x, deterministic=deterministic)
        return global_feat, local_feat, None
