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


def make_image_embedder(module):
    """Jitted ``encode_image`` + L2-norm — the single serving/eval/bench
    hot path (``(params, images) -> [B, D]`` unit-norm f32 embeddings).
    eval, bench.py's infer leg, and cli/serve.py all call this one
    function so the deployed math cannot diverge between surfaces."""

    @jax.jit
    def encode(p, images):
        g, _, _ = module.model.apply(
            {"params": p}, images,
            method=lambda mdl, im: mdl.encode_image(im, deterministic=True))
        g = g.astype(jnp.float32)
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                               1e-12)

    return encode


def encode_images(module, params, batches: Iterable[Dict[str, np.ndarray]]):
    """Yields ([B, D] normalized global image embeddings, labels [B, ...])."""
    encode = make_image_embedder(module)
    for batch in batches:
        yield encode(params, batch["image"]), batch.get("label")


def _average_ranks(x: np.ndarray) -> np.ndarray:
    """1-based ranks with ties assigned their average rank."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), np.float64)
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def binary_auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based (Mann-Whitney U) AUROC; NaN if one class is absent."""
    pos = np.asarray(labels) > 0.5
    n_pos = int(pos.sum())
    n_neg = int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    r = _average_ranks(np.asarray(scores, np.float64))
    u = r[pos].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def zero_shot_classification(module, params, tokenizer,
                             batches: Iterable[Dict[str, np.ndarray]],
                             class_names: Sequence[str],
                             prompt_template: str = "this is a photo of {}",
                             max_length: int = 25) -> Dict[str, float]:
    """Prompt-based classification (paper Table 1 protocol).

    Single-label targets → argmax accuracy. Multilabel targets (CheXpert's
    5 competition tasks, reference chexpert.py:119-141) → per-task AUROC
    over the prompt-similarity scores (the BASELINE 'zero-shot CheXpert
    AUC' metric) plus argmax-vs-argmax accuracy.
    """
    class_emb = encode_class_prompts(module, params, tokenizer, class_names,
                                     prompt_template, max_length)
    all_sims: List[np.ndarray] = []
    all_labels: List[np.ndarray] = []
    for img_emb, labels in encode_images(module, params, batches):
        all_sims.append(np.asarray(img_emb @ class_emb.T))   # [B, C]
        all_labels.append(np.asarray(labels))
    sims = np.concatenate(all_sims)
    labels = np.concatenate(all_labels)

    out: Dict[str, float] = {"zero_shot/n": float(len(sims))}
    if labels.ndim > 1 and labels.shape[1] == len(class_names):
        # multilabel: AUC per task + macro mean
        aucs = []
        for c, name in enumerate(class_names):
            auc = binary_auroc(sims[:, c], labels[:, c])
            out[f"zero_shot/auroc/{name}"] = auc
            if np.isfinite(auc):
                aucs.append(auc)
        out["zero_shot/auroc"] = float(np.mean(aucs)) if aucs \
            else float("nan")
        hard = labels.argmax(-1)
    else:
        hard = labels.argmax(-1) if labels.ndim > 1 else labels
    out["zero_shot/accuracy"] = float((sims.argmax(-1) == hard).mean()) \
        if len(sims) else 0.0
    return out


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


def load_for_eval(cfg, module=None, datamodule=None, tokenizer=None,
                  synthetic_init: bool = False):
    """(module, datamodule, tokenizer, params) for an eval/serving surface:
    instantiate from config, init params from one batch, then apply
    medclip_ckpt conversion and/or an orbax ckpt_path restore.

    ``synthetic_init=True`` builds the shape-init batch from config shapes
    instead of pulling one from ``test_dataloader()`` — a serving host with
    only a checkpoint (no eval dataset on disk) must not need CheXpert CSVs
    just to initialize parameter shapes before the orbax restore."""
    from medmoe_tpu.utils import instantiate
    from medmoe_tpu.utils.checkpoint import load_params

    module = module or instantiate(cfg.model)
    datamodule = datamodule or instantiate(cfg.data)
    tokenizer = tokenizer or datamodule.tokenizer
    module.text_cfg["vocab_size"] = max(
        int(module.text_cfg.get("vocab_size", 0)), tokenizer.vocab_size)

    if synthetic_init:
        size = int(cfg.model.model.vision.image_size)
        init_batch = {"image": np.zeros((1, size, size, 3), np.float32),
                      "label": np.zeros((1,), np.int32)}
    else:
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
    if cfg.get("medclip_ckpt"):
        # torch MedCLIP weights → converted into both towers (reference
        # med_moe.py:40-62); exercises the convert→load→zero-shot gate
        from medmoe_tpu.models.convert import load_medclip_checkpoint

        vision = cfg.model.model.vision
        params = load_medclip_checkpoint(
            params, cfg.medclip_ckpt,
            depths=tuple(vision.get("swin_depths", (2, 2, 6, 2))),
            num_layers=int(cfg.model.model.text.num_layers))
    if cfg.get("ckpt_path"):
        params = load_params(cfg.ckpt_path, params)
    return module, datamodule, tokenizer, params


def default_class_names(cfg, datamodule) -> List[str]:
    """Precedence: explicit config > the dataset's own label space
    (CheXpert competition tasks / the UniMed modality classes from the
    labeler scripts) > bare indices."""
    return list(cfg.eval.get("class_names")
                or getattr(datamodule, "COMPETITION_TASKS", None)
                or getattr(datamodule, "CLASS_NAMES", None)
                or [str(i) for i in range(datamodule.num_classes)])


def run_eval_zs(cfg, module=None, datamodule=None,
                tokenizer=None) -> Dict[str, float]:
    """Config-driven harness (configs/eval_zs.yaml)."""
    module, datamodule, tokenizer, params = load_for_eval(
        cfg, module, datamodule, tokenizer)

    protocol = cfg.eval.get("protocol", "zero_shot")
    if protocol == "zero_shot":
        class_names = default_class_names(cfg, datamodule)
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
