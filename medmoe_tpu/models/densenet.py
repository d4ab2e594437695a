"""DenseNet backbone family (reference src/models/components/
cnn_backbones.py:63-81 exposes torchvision densenet_121/161/169 through the
backbone factory with feature dims 1024/2208/1664 and interm None).

From-scratch flax implementation of the torchvision DenseNet-BC layout:
7x7/2 stem -> 3x3/2 maxpool -> 4 dense blocks joined by 1x1-conv + 2x2
avg-pool transitions that halve channels -> final norm -> global avg pool.
Each dense layer is norm-relu-conv1x1(bn_size*k) -> norm-relu-conv3x3(k),
concatenated onto the running feature map.

TPU notes: NHWC layout; concat-heavy graphs are XLA-friendly (pure fusion
fodder). The stateless 'group' norm option adapts its group count to the
running channel width (``gcd(32, C)`` — see resnet._norm): DenseNet-121/169
widths are all multiples of 32 (plain GroupNorm(32)), while DenseNet-161's
growth-48 maps (144, 240, …) land on 16 groups.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from medmoe_tpu.models.resnet import _norm


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = _norm(self.norm, "norm1", deterministic,
                  channels=x.shape[-1])(x)
        y = jax.nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    param_dtype=jnp.float32, name="conv1")(y)
        y = _norm(self.norm, "norm2", deterministic,
                  channels=y.shape[-1])(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, param_dtype=jnp.float32, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    features: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = _norm(self.norm, "norm", deterministic,
                  channels=x.shape[-1])(x)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    param_dtype=jnp.float32, name="conv")(y)
        return nn.avg_pool(y, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """Returns (global_feat, local_feat) with the same contract as the
    ResNet family: local = the stage-3 feature map (channel-first), global
    = pooled final features."""

    block_config: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 32
    init_features: int = 64
    bn_size: int = 4
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.Conv(self.init_features, (7, 7), (2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    param_dtype=jnp.float32, name="conv0")(x)
        y = _norm(self.norm, "norm0", deterministic,
                  channels=y.shape[-1])(y)
        y = jax.nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        local = None
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                y = DenseLayer(self.growth_rate, self.bn_size, self.norm,
                               name=f"block{i + 1}_layer{j + 1}")(
                    y, deterministic=deterministic)
            if i == 2:
                local = y
            if i != len(self.block_config) - 1:
                y = Transition(y.shape[-1] // 2, self.norm,
                               name=f"transition{i + 1}")(
                    y, deterministic=deterministic)

        y = _norm(self.norm, "norm_final", deterministic,
                  channels=y.shape[-1])(y)
        y = jax.nn.relu(y)
        global_feat = jnp.mean(y, axis=(1, 2))
        return global_feat, local.transpose(0, 3, 1, 2)


def DenseNet121(**kw):
    return DenseNet(block_config=(6, 12, 24, 16), growth_rate=32,
                    init_features=64, **kw)


def DenseNet161(**kw):
    return DenseNet(block_config=(6, 12, 36, 24), growth_rate=48,
                    init_features=96, **kw)


def DenseNet169(**kw):
    return DenseNet(block_config=(6, 12, 32, 32), growth_rate=32,
                    init_features=64, **kw)


class DenseNetVisionTower(nn.Module):
    """DenseNet path of the ImageEncoder facade, mirroring the CNN path of
    reference vision_encoder.py:85-104: bilinear-resize the input to
    299x299, run the backbone, return (global, local[stage3], None)."""

    cfg: object

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True):
        name = self.cfg.get("model_name", "densenet_121")
        ctor = {"densenet_121": DenseNet121, "densenet_161": DenseNet161,
                "densenet_169": DenseNet169}.get(name, DenseNet121)
        backbone = ctor(norm=self.cfg.get("norm", "group"), name="model")
        x = jax.image.resize(
            pixels, (pixels.shape[0], 299, 299, pixels.shape[-1]),
            method="bilinear")
        global_feat, local_feat = backbone(x, deterministic=deterministic)
        return global_feat, local_feat, None
