"""Linear probing: frozen image encoder + trained linear head.

Reference analogue: PretrainedImageClassifier with a frozen encoder
(reference src/models/components/vision_encoder.py:140-158) — the paper's
Table 2 protocol at 1% / 10% / 100% training fractions.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def extract_features(module, params, batches) -> Tuple[np.ndarray, np.ndarray]:
    @jax.jit
    def encode(p, images):
        g, _, _ = module.model.apply(
            {"params": p}, images,
            method=lambda mdl, im: mdl.encode_image(im, deterministic=True))
        return g.astype(jnp.float32)

    feats, labels = [], []
    for batch in batches:
        feats.append(np.asarray(encode(params, batch["image"])))
        labels.append(np.asarray(batch["label"]))
    return np.concatenate(feats), np.concatenate(labels)


def _train_head(x: np.ndarray, y: np.ndarray, num_classes: int,
                lr: float = 1e-3, epochs: int = 50, seed: int = 0,
                multilabel: bool = False) -> jnp.ndarray:
    d = x.shape[-1]
    key = jax.random.PRNGKey(seed)
    w = jnp.zeros((d, num_classes), jnp.float32)
    b = jnp.zeros((num_classes,), jnp.float32)
    tx = optax.adam(lr)
    opt_state = tx.init((w, b))

    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(wb):
        w, b = wb
        logits = xj @ w + b
        if multilabel:
            return jnp.mean(optax.sigmoid_binary_cross_entropy(
                logits, yj.astype(jnp.float32)))
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, yj.astype(jnp.int32)))

    @jax.jit
    def step(wb, opt_state):
        grads = jax.grad(loss_fn)(wb)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(wb, updates), opt_state

    wb = (w, b)
    for _ in range(epochs):
        wb, opt_state = step(wb, opt_state)
    return wb


def linear_probe(module, params, datamodule,
                 fractions: Sequence[float] = (0.01, 0.1, 1.0),
                 lr: float = 1e-3, epochs: int = 50,
                 seed: int = 0) -> Dict[str, float]:
    """Accuracy of a linear head on frozen global image features, at several
    training-data fractions (paper Table 2)."""
    test_x, test_y = extract_features(module, params,
                                      datamodule.test_dataloader())
    multilabel = test_y.ndim > 1
    num_classes = test_y.shape[-1] if multilabel else int(test_y.max()) + 1

    out: Dict[str, float] = {}
    full_x, full_y = extract_features(module, params,
                                      datamodule.train_dataloader(epoch=0))
    rng = np.random.RandomState(seed)
    for frac in fractions:
        n = max(1, int(len(full_x) * frac))
        idx = rng.permutation(len(full_x))[:n]
        wb = _train_head(full_x[idx], full_y[idx], num_classes, lr, epochs,
                         seed, multilabel)
        w, b = wb
        logits = np.asarray(jnp.asarray(test_x) @ w + b)
        if multilabel:
            pred = (logits > 0).astype(np.float32)
            acc = float((pred == test_y).mean())
        else:
            acc = float((logits.argmax(-1) == test_y).mean())
        out[f"linear_probe/acc@{int(frac * 100)}%"] = acc
    return out
