"""Classification heads (reference vision_encoder.py:140-174).

``PretrainedImageClassifier`` — frozen pretrained encoder + linear head
(the linear-probing model of paper Table 2); ``ImageClassifier`` — backbone
+ head trained end-to-end.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class LinearHead(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.num_classes, param_dtype=jnp.float32,
                        name="classifier")(feats)


class PretrainedImageClassifier(nn.Module):
    """Frozen encoder → linear classifier (reference
    vision_encoder.py:140-158). Freezing = stop_gradient on the encoder
    output, so the backbone never sees gradients."""

    encoder: nn.Module
    num_classes: int
    freeze_encoder: bool = True

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        out = self.encoder(pixels, deterministic=deterministic)
        feats = out[0] if isinstance(out, tuple) else out
        if self.freeze_encoder:
            feats = jax.lax.stop_gradient(feats)
        return LinearHead(self.num_classes, name="head")(feats)


class ImageClassifier(nn.Module):
    """End-to-end trainable backbone + head (reference
    vision_encoder.py:161-174)."""

    encoder: nn.Module
    num_classes: int

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        out = self.encoder(pixels, deterministic=deterministic)
        feats = out[0] if isinstance(out, tuple) else out
        return LinearHead(self.num_classes, name="head")(feats)
