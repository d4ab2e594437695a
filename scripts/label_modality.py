#!/usr/bin/env python
"""Zero-shot modality auto-labeler (reference scripts/label_{roco,pmcoa,
quilt,openi}.py).

The reference labels each sample's imaging modality by zero-shot BiomedCLIP
with the prompt 'this is a photo of ' + label over six modality classes and
writes the argmax as the router-supervision `cls` field
(reference scripts/label_roco.py:10-25,64-69). This port runs the same
protocol with a medmoe_tpu checkpoint (or any model exposing
encode_image/encode_text).

Usage:
  python scripts/label_modality.py --annotations data/roco/anns.jsonl \
      --image-root data/roco/images --output data/roco/anns_labeled.jsonl \
      --ckpt logs/train/runs/checkpoints/last --vocab vocab.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# label space of the reference labelers (scripts/label_roco.py:18-25)
MODALITY_LABELS = [
    "X-ray", "CT scan", "MRI scan", "Ultrasound", "Histopathology",
    "Fundus photograph",
]
PROMPT = "this is a photo of {}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--image-root", default="")
    ap.add_argument("--output", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--image-key", default="image")
    args = ap.parse_args()

    import jax

    from medmoe_tpu.config import compose
    from medmoe_tpu.data.tokenizer import load_or_build_tokenizer
    from medmoe_tpu.data.transforms import ImageTransform, decode_image
    from medmoe_tpu.eval.zero_shot import (encode_class_prompts,
                                           encode_images)
    from medmoe_tpu.utils import instantiate
    from medmoe_tpu.utils.checkpoint import load_params

    cfg = compose("eval_zs", [])
    module = instantiate(cfg.model)
    tokenizer = load_or_build_tokenizer(
        vocab_path=args.vocab,
        corpus=[PROMPT.format(label) for label in MODALITY_LABELS])
    module.text_cfg["vocab_size"] = max(
        int(module.text_cfg.get("vocab_size", 0)), tokenizer.vocab_size)

    records = []
    with open(args.annotations) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))

    transform = ImageTransform(int(cfg.model.model.vision.image_size))

    def batches():
        images, keep = [], []
        for idx, rec in enumerate(records):
            path = rec.get(args.image_key, "")
            if args.image_root and not os.path.isabs(path):
                path = os.path.join(args.image_root, path)
            try:
                images.append(transform(decode_image(open(path, "rb").read())))
                keep.append(idx)
            except Exception:
                continue
            if len(images) == args.batch_size:
                yield {"image": np.stack(images)}, keep
                images, keep = [], []
        if images:
            yield {"image": np.stack(images)}, keep

    # init params from one batch, then optional checkpoint
    first = next(iter(batches()))[0]
    enc = tokenizer.encode_batch(["init"],
                                 max_length=cfg.model.model.text.max_length)
    init_batch = {**first}
    b = first["image"].shape[0]
    for k in ("input_ids", "attention_mask", "token_type_ids", "segment_ids"):
        init_batch[k] = np.repeat(enc[k], b, axis=0)
    init_batch["cap_lens"] = np.repeat(enc["cap_lens"], b, axis=0)
    params = jax.jit(module.init_params)(jax.random.PRNGKey(0), init_batch)
    if args.ckpt:
        params = load_params(args.ckpt, params)

    class_emb = encode_class_prompts(module, params, tokenizer,
                                     MODALITY_LABELS, PROMPT,
                                     int(cfg.model.model.text.max_length))
    labeled = 0
    for batch, keep in batches():
        for (emb, _), idx_list in [(next(encode_images(module, params,
                                                       [batch])), keep)]:
            sims = np.asarray(emb @ class_emb.T)
            preds = sims.argmax(-1)
            for rec_idx, pred in zip(idx_list, preds):
                records[rec_idx]["cls"] = int(pred)
                records[rec_idx]["modality"] = MODALITY_LABELS[int(pred)]
                labeled += 1

    with open(args.output, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    print(f"labeled {labeled}/{len(records)} records -> {args.output}")


if __name__ == "__main__":
    main()
