"""Top-level MedMoE model (reference src/models/components/med_moe.py).

TPU-first restructuring of the reference forward path:
  * tokenization and image preprocessing live in the INPUT PIPELINE
    (medmoe_tpu/data/), not inside forward — the reference tokenizes and
    runs PIL preprocessing per step inside the model (med_moe.py:72-79,
    swin.py:131), starving the accelerator and forcing dynamic shapes;
  * the model consumes a fully device-ready batch with static shapes:
      image          [B, 224, 224, 3] float  (normalized NHWC)
      input_ids      [B, T=25] int32
      attention_mask [B, T] int32
      token_type_ids [B, T] int32
      segment_ids    [B, T] int32  (wordpiece-merge slots, tokenizer-computed)
  * outputs mirror MedMoE.forward (med_moe.py:102-108):
      (img_emb_g [B,D], img_emb_l [B,D,H,W], text_emb_g [B,D],
       text_emb_l [B,D,T], router_probs [B,K] or None)
    ``sents``/cap_lens are host-side pipeline products (see data/tokenizer.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from medmoe_tpu.models.layers import l2_normalize
from medmoe_tpu.models.text_encoder import BertTextEncoder
from medmoe_tpu.models.vision_encoder import ImageEncoder

# normalization stats mirrored from the host transforms
# (medmoe_tpu/data/transforms.py NORM_STATS)
_DEVICE_NORM = {
    "imagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "half": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
}


class MedMoE(nn.Module):
    vision: Any                       # `vision` config node
    text: Any                         # `text` config node

    def setup(self):
        self.image_encoder = ImageEncoder(self.vision)
        self.text_encoder = BertTextEncoder(self.text)

    def _maybe_normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        """uint8 batches are normalized ON DEVICE: the host ships 4× fewer
        bytes and XLA fuses the rescale into the patch-embed convolution.
        float batches are assumed host-normalized (parity default)."""
        if images.dtype != jnp.uint8:
            return images
        mean, std = _DEVICE_NORM[self.vision.get("norm_stats", "imagenet")]
        x = images.astype(jnp.float32) / 255.0
        return (x - jnp.asarray(mean)) / jnp.asarray(std)

    def encode_image(self, images: jnp.ndarray, deterministic: bool = True):
        return self.image_encoder(self._maybe_normalize(images),
                                  deterministic=deterministic)

    def encode_text(self, input_ids, attention_mask, token_type_ids,
                    segment_ids, deterministic: bool = True):
        word, sent = self.text_encoder(input_ids, attention_mask,
                                       token_type_ids, segment_ids,
                                       deterministic=deterministic)
        if self.text.get("projection", False):
            # reference med_moe.py:87-90 (marked "not tested" there)
            return word, sent
        if self.text.get("norm", False):
            word = l2_normalize(word, axis=1)
            sent = l2_normalize(sent, axis=1)
        return word, sent

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray, Optional[jnp.ndarray]]:
        text_emb_l, text_emb_g = self.encode_text(
            batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"], batch["segment_ids"],
            deterministic=deterministic)
        img_emb_g, img_emb_l, router_probs = self.encode_image(
            batch["image"], deterministic=deterministic)
        return img_emb_g, img_emb_l, text_emb_g, text_emb_l, router_probs
