"""Zero-shot evaluation harness.

The reference ships this protocol as an EMPTY file (src/eval_zs.py is
0 bytes) — only its config and the paper's protocol survive. Rebuilt here
per SURVEY §3.4: encode one prompt per class ("this is a photo of {label}",
the exact template of the labeler scripts, reference
scripts/label_roco.py:26), encode images, cosine-sim argmax → accuracy
(CheXpert-5x200-style); plus bidirectional image↔text retrieval R@K.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def encode_class_prompts(module, params, tokenizer, class_names: Sequence[str],
                         prompt_template: str = "this is a photo of {}",
                         max_length: int = 25) -> jnp.ndarray:
    """[C, D] L2-normalized global text embeddings, one per class."""
    prompts = [prompt_template.format(name) for name in class_names]
    enc = tokenizer.encode_batch(prompts, max_length=max_length)

    @jax.jit
    def encode(p, ids, mask, types, segs):
        _, sent = module.model.apply(
            {"params": p}, ids, mask, types, segs,
            method=lambda mdl, *a: mdl.encode_text(*a))
        return sent

    sent = encode(params, enc["input_ids"], enc["attention_mask"],
                  enc["token_type_ids"], enc["segment_ids"])
    sent = sent.astype(jnp.float32)
    return sent / jnp.maximum(jnp.linalg.norm(sent, axis=-1, keepdims=True),
                              1e-12)


def encode_images(module, params, batches: Iterable[Dict[str, np.ndarray]]):
    """Yields ([B, D] normalized global image embeddings, labels [B, ...])."""

    @jax.jit
    def encode(p, images):
        g, _, _ = module.model.apply(
            {"params": p}, images,
            method=lambda mdl, im: mdl.encode_image(im, deterministic=True))
        g = g.astype(jnp.float32)
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                               1e-12)

    for batch in batches:
        yield encode(params, batch["image"]), batch.get("label")


def zero_shot_classification(module, params, tokenizer,
                             batches: Iterable[Dict[str, np.ndarray]],
                             class_names: Sequence[str],
                             prompt_template: str = "this is a photo of {}",
                             max_length: int = 25) -> Dict[str, float]:
    """Prompt-based classification accuracy (paper Table 1 protocol)."""
    class_emb = encode_class_prompts(module, params, tokenizer, class_names,
                                     prompt_template, max_length)
    correct = 0
    total = 0
    for img_emb, labels in encode_images(module, params, batches):
        sims = np.asarray(img_emb @ class_emb.T)            # [B, C]
        pred = sims.argmax(-1)
        labels = np.asarray(labels)
        if labels.ndim > 1:
            labels = labels.argmax(-1)                       # one/multi-hot
        correct += int((pred == labels).sum())
        total += len(pred)
    return {"zero_shot/accuracy": correct / max(total, 1),
            "zero_shot/n": float(total)}


def image_text_retrieval(module, params,
                         batches: Iterable[Dict[str, np.ndarray]],
                         ks: Sequence[int] = (1, 5, 10)) -> Dict[str, float]:
    """Bidirectional retrieval R@K over paired batches (ROCO-style)."""

    @jax.jit
    def encode_pair(p, batch):
        img_g, _, txt_g, _, _ = module.model.apply(
            {"params": p}, batch, deterministic=True)
        img_g = img_g.astype(jnp.float32)
        txt_g = txt_g.astype(jnp.float32)
        img_g = img_g / jnp.maximum(
            jnp.linalg.norm(img_g, axis=-1, keepdims=True), 1e-12)
        txt_g = txt_g / jnp.maximum(
            jnp.linalg.norm(txt_g, axis=-1, keepdims=True), 1e-12)
        return img_g, txt_g

    img_all: List[np.ndarray] = []
    txt_all: List[np.ndarray] = []
    for batch in batches:
        i, t = encode_pair(params, batch)
        img_all.append(np.asarray(i))
        txt_all.append(np.asarray(t))
    img = np.concatenate(img_all)
    txt = np.concatenate(txt_all)
    sims = img @ txt.T                                      # [N, N]
    n = sims.shape[0]
    out: Dict[str, float] = {}
    for name, s in (("i2t", sims), ("t2i", sims.T)):
        ranks = (-s).argsort(-1)
        position = (ranks == np.arange(n)[:, None]).argmax(-1)
        for k in ks:
            out[f"retrieval/{name}_r@{k}"] = float((position < k).mean())
        out[f"retrieval/{name}_median_rank"] = float(
            np.median(position) + 1)
    return out


def run_eval_zs(cfg, module=None, datamodule=None,
                tokenizer=None) -> Dict[str, float]:
    """Config-driven harness (configs/eval_zs.yaml)."""
    from medmoe_tpu.utils import instantiate
    from medmoe_tpu.utils.checkpoint import load_params

    module = module or instantiate(cfg.model)
    datamodule = datamodule or instantiate(cfg.data)
    tokenizer = tokenizer or datamodule.tokenizer
    module.text_cfg["vocab_size"] = max(
        int(module.text_cfg.get("vocab_size", 0)), tokenizer.vocab_size)

    init_batch = next(iter(datamodule.test_dataloader()))
    if "input_ids" not in init_batch:
        # image-only datasets (CheXpert): synthesize text fields for init
        enc = tokenizer.encode_batch(["init"], max_length=cfg.model.model
                                     .text.max_length)
        init_batch = dict(init_batch)
        b = init_batch["image"].shape[0]
        for k in ("input_ids", "attention_mask", "token_type_ids",
                  "segment_ids"):
            init_batch[k] = np.repeat(enc[k], b, axis=0)
        init_batch["cap_lens"] = np.repeat(enc["cap_lens"], b, axis=0)

    params = jax.jit(module.init_params)(jax.random.PRNGKey(cfg.get("seed")
                                                            or 0), init_batch)
    if cfg.get("ckpt_path"):
        params = load_params(cfg.ckpt_path, params)

    protocol = cfg.eval.get("protocol", "zero_shot")
    if protocol == "zero_shot":
        class_names = list(cfg.eval.get("class_names")
                           or getattr(datamodule, "COMPETITION_TASKS", None)
                           or [str(i) for i in range(datamodule.num_classes)])
        return zero_shot_classification(
            module, params, tokenizer, datamodule.test_dataloader(),
            class_names, cfg.eval.get("prompt_template",
                                      "this is a photo of {}"),
            int(cfg.model.model.text.max_length))
    if protocol == "retrieval":
        return image_text_retrieval(module, params,
                                    datamodule.test_dataloader(),
                                    tuple(cfg.eval.get("retrieval_ks",
                                                       (1, 5, 10))))
    if protocol == "linear_probe":
        from medmoe_tpu.eval.linear_probe import linear_probe

        return linear_probe(module, params, datamodule,
                            fractions=tuple(cfg.eval.linear_probe.fractions),
                            lr=float(cfg.eval.linear_probe.lr),
                            epochs=int(cfg.eval.linear_probe.epochs))
    raise ValueError(f"unknown eval protocol {protocol!r}")
