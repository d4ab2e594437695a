"""Supervised classification task module (reference MedMoELitModule,
src/models/medmoe_module.py:17-169 — the base-class role: classification
fine-tuning / linear probing with accuracy metrics, Adam + plateau LR).

Drives PretrainedImageClassifier / ImageClassifier (medmoe_tpu/models/
heads.py) through the same Trainer as pretraining. Supports multiclass CE
(integer labels) and multilabel BCE (vector labels, e.g. CheXpert's 5
competition tasks).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from medmoe_tpu.config import DotDict
from medmoe_tpu.models.heads import ImageClassifier, PretrainedImageClassifier
from medmoe_tpu.models.vision_encoder import ImageEncoder


class ClassificationModule:
    def __init__(self, model: Any = None, optimizer: Any = None,
                 scheduler: Any = None, compile: bool = True,
                 num_classes: int = 6, freeze_encoder: bool = True,
                 multilabel: bool = False, vision: Any = None):
        self.optimizer_factory = optimizer
        self.scheduler_factory = scheduler
        self.num_classes = num_classes
        self.multilabel = multilabel
        vision = vision if vision is not None else (
            model.vision if hasattr(model, "vision") else model)
        self.vision_cfg = vision if isinstance(vision, DotDict) \
            else DotDict(vision or {})
        self.text_cfg = DotDict({})  # no text tower in this task
        self.freeze_encoder = bool(freeze_encoder)
        encoder = ImageEncoder(self.vision_cfg)
        cls = PretrainedImageClassifier if freeze_encoder else ImageClassifier
        self.model = cls(encoder, num_classes=num_classes)

    def init_params(self, rng: jax.Array, batch: Dict[str, jnp.ndarray]):
        return self.model.init({"params": rng, "dropout": rng},
                               batch["image"])["params"]

    def loss_fn(self, params, batch, deterministic: bool = True,
                rngs: Optional[Dict[str, jax.Array]] = None
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        logits = self.model.apply({"params": params}, batch["image"],
                                  deterministic=deterministic,
                                  rngs=rngs or {})
        labels = batch["label"]
        if self.multilabel or labels.ndim > 1:
            loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
                logits, labels.astype(jnp.float32)))
            acc = jnp.mean(((logits > 0) == (labels > 0.5))
                           .astype(jnp.float32))
        else:
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, labels.astype(jnp.int32)))
            acc = jnp.mean((jnp.argmax(logits, -1) == labels)
                           .astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc,
                      "l_loss": jnp.zeros(()), "g_loss": jnp.zeros(()),
                      "c_loss": loss, "c_acc": acc}

    def trainable_mask(self, params: Any) -> Any:
        """False on the frozen encoder subtree (linear probing keeps Adam
        state only for the head — see MedMoEPretrainingModule.trainable_mask
        for the rationale)."""
        mask = jax.tree_util.tree_map(lambda _: True, params)
        if self.freeze_encoder and "encoder" in params:
            mask = {**mask, "encoder": jax.tree_util.tree_map(
                lambda _: False, params["encoder"])}
        return mask

    def make_optimizer(self, gradient_clip_val: Optional[float] = None):
        if self.optimizer_factory is None:
            from medmoe_tpu.train.optim import adam

            tx = adam(lr=1e-3, gradient_clip_val=gradient_clip_val)
        else:
            tx = self.optimizer_factory(gradient_clip_val=gradient_clip_val)
        if self.freeze_encoder:
            from medmoe_tpu.train.optim import freeze_mask

            tx = freeze_mask(tx, self.trainable_mask)
        return tx

    def make_scheduler(self):
        return self.scheduler_factory() if self.scheduler_factory else None
