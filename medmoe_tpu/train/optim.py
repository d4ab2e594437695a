"""Optimizers + schedulers (reference configs/model/med-moe_pretraining.yaml:7-18).

``adam`` mirrors torch.optim.Adam(lr, weight_decay) — decoupled=False, i.e.
L2-added-to-grad semantics (optax.add_decayed_weights before the adam
transform reproduces torch's ``weight_decay`` exactly for Adam).

``reduce_lr_on_plateau`` is a host-side scheduler: it watches a monitored
metric between epochs and rescales the learning rate inside the optimizer
state (optax.inject_hyperparams makes it a mutable array in opt_state) —
the TPU-native equivalent of torch.optim.lr_scheduler.ReduceLROnPlateau.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
import optax


def adam(lr: float = 5e-5, weight_decay: float = 0.0, b1: float = 0.9,
         b2: float = 0.999, eps: float = 1e-8,
         gradient_clip_val: Optional[float] = None
         ) -> optax.GradientTransformation:
    def build(learning_rate):
        parts = []
        if gradient_clip_val:
            parts.append(optax.clip_by_global_norm(gradient_clip_val))
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        parts.append(optax.scale(-learning_rate))
        return optax.chain(*parts)

    return optax.inject_hyperparams(build)(learning_rate=lr)


def freeze_mask(tx: optax.GradientTransformation,
                mask: Any) -> optax.GradientTransformation:
    """Apply ``tx`` only to trainable leaves (``mask`` leaf True).

    Frozen leaves carry NO optimizer state (no Adam moments — ~880 MB of
    HBM for a frozen BERT-base) and their "update" is the incoming
    gradient passed through unchanged — exactly zero under stop_gradient
    freezing, so apply_updates is a no-op on them. This matches torch
    Adam's behavior for requires_grad=False params (skipped entirely), in
    particular weight decay does NOT touch frozen params. ``mask`` may be
    a pytree of bools or a callable params→pytree (evaluated lazily, so
    the transformation can be built before the params exist).
    """
    return optax.masked(tx, mask)


def _unwrap_masked(opt_state: Any) -> Any:
    while isinstance(opt_state, optax.MaskedState):
        opt_state = opt_state.inner_state
    return opt_state


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Rewrite the injected learning rate inside an optimizer state
    (descending through optax.MaskedState wrappers)."""
    if isinstance(opt_state, optax.MaskedState):
        return optax.MaskedState(
            inner_state=set_learning_rate(opt_state.inner_state, lr))
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(
        hp["learning_rate"]).dtype)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state: Any) -> float:
    return float(_unwrap_masked(opt_state).hyperparams["learning_rate"])


class reduce_lr_on_plateau:  # noqa: N801 — config-surface name
    """Host-side ReduceLROnPlateau (reference scheduler config:
    mode=min, factor=0.1, patience=10, monitored on val/loss per epoch)."""

    def __init__(self, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, min_lr: float = 0.0,
                 threshold: float = 1e-4):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0

    def _is_better(self, value: float) -> bool:
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, value: float, current_lr: float) -> float:
        """Returns the (possibly reduced) learning rate."""
        if self._is_better(value):
            self.best = value
            self.num_bad_epochs = 0
            return current_lr
        self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, state: dict) -> None:
        self.best = state["best"]
        self.num_bad_epochs = state["num_bad_epochs"]
