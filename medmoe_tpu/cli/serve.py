"""Online zero-shot serving CLI: stream images through the deployed
protocol (class prompts encoded once, then encode_image + cosine argmax),
emitting one JSON line per image.

The reference repo has no serving entry point (its eval files are empty);
this surface packages the cli/eval_zs.py hot path for deployment use:

  * images arrive as paths — one per line on stdin (``serve.input=-``), a
    file list, or a directory tree — and are decoded/resized on the host;
  * the device runs fixed-shape waves of ``serve.batch_size`` images
    (default 32, the measured per-chip optimum — docs/PERFORMANCE.md
    "Serving"; the final partial wave is padded, padding rows discarded),
    so ONE compiled program serves the whole stream: no recompiles, and
    the persistent compile cache (extras.compile_cache) covers restarts;
  * ``serve.mode=classify`` emits {path, label, score, probs};
    ``serve.mode=embed`` emits {path, embedding} (the L2-normalized global
    image embedding) for downstream indexing/retrieval.

Usage:
  python -m medmoe_tpu.cli.serve ckpt_path=<orbax-dir> data=unimed \\
      serve.input=scans/ serve.mode=classify
  find scans -name '*.jpg' | python -m medmoe_tpu.cli.serve \\
      ckpt_path=... serve.input=-
"""

from __future__ import annotations

import json
import os
import sys
from typing import Iterator, List, Optional

import numpy as np

from medmoe_tpu.config import compose
from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)

_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".gif", ".webp")


def _iter_paths(spec: str) -> Iterator[str]:
    """Image paths from stdin ('-'), a directory tree, or a list file."""
    if spec == "-":
        for line in sys.stdin:
            line = line.strip()
            if line:
                yield line
        return
    if os.path.isdir(spec):
        for root, _, files in sorted(os.walk(spec)):
            for name in sorted(files):
                if name.lower().endswith(_IMAGE_EXTS):
                    yield os.path.join(root, name)
        return
    with open(spec) as f:
        for line in f:
            line = line.strip()
            if line:
                yield line


def _waves(paths: Iterator[str], size: int):
    wave: List[str] = []
    for p in paths:
        wave.append(p)
        if len(wave) == size:
            yield wave
            wave = []
    if wave:
        yield wave


def main(argv: Optional[List[str]] = None) -> int:
    import jax

    from medmoe_tpu.data.prefetch import prefetch
    from medmoe_tpu.data.transforms import ImageTransform, decode_image
    from medmoe_tpu.eval.zero_shot import (default_class_names,
                                           encode_class_prompts,
                                           load_for_eval,
                                           make_image_embedder)
    from medmoe_tpu.utils.task import extras

    # the JSONL stream owns stdout: point the log handlers (stdout by
    # default, matching the train CLI) at stderr so piped consumers see
    # records only
    import logging

    for h in logging.getLogger().handlers:
        if isinstance(h, logging.StreamHandler) and h.stream is sys.stdout:
            h.stream = sys.stderr

    overrides = list(argv if argv is not None else sys.argv[1:])
    from medmoe_tpu.cli._help import maybe_print_help

    if maybe_print_help(
            overrides, "python -m medmoe_tpu.cli.serve",
            "Online zero-shot serving: stream image paths -> JSONL.",
            ["find scans/ -name '*.jpg' | python -m medmoe_tpu.cli.serve "
             "ckpt_path=... serve.input=-",
             "python -m medmoe_tpu.cli.serve ckpt_path=... "
             "serve.input=scans/ serve.mode=embed"]):
        return 0
    cfg = compose("eval_zs", overrides)
    extras(cfg)
    if cfg.get("accelerator") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    serve_cfg = cfg.get("serve") or {}
    spec = serve_cfg.get("input") or "-"
    wave_size = int(serve_cfg.get("batch_size", 32))
    mode = serve_cfg.get("mode", "classify")
    if mode not in ("classify", "embed"):
        # fail fast at config parse — not after minutes of model init
        raise SystemExit(f"serve.mode must be 'classify' or 'embed', "
                         f"got {mode!r}")
    out = sys.stdout

    # synthetic_init: a serving host needs only the checkpoint — parameter
    # shapes init from config, never from an eval dataset on disk
    module, datamodule, tokenizer, params = load_for_eval(
        cfg, synthetic_init=True)
    image_size = int(cfg.model.model.vision.image_size)
    transform = ImageTransform(image_size, train=False)

    class_names = default_class_names(cfg, datamodule)
    class_emb = None
    if mode == "classify":
        class_emb = np.asarray(encode_class_prompts(
            module, params, tokenizer, class_names,
            cfg.eval.get("prompt_template", "this is a photo of {}"),
            int(cfg.model.model.text.max_length)))        # [C, D]

    encode = make_image_embedder(module)

    def _decode_wave(wave):
        """Host work for one wave — runs on the prefetch worker thread so
        JPEG decode overlaps the in-flight device step (the host leg is
        ~350-530 img/s vs the device's ~1570; serialized they'd bound
        serving at ~290 img/s)."""
        images, kept, errors = [], [], []
        for path in wave:
            try:
                with open(path, "rb") as f:
                    images.append(transform(decode_image(f.read())))
                kept.append(path)
            except Exception as exc:                     # nothrow per image
                errors.append((path, f"{type(exc).__name__}: {exc}"))
        # fixed-shape wave: pad to wave_size so ONE compiled program serves
        # every wave (padding rows are sliced off before output)
        batch = np.zeros((wave_size, image_size, image_size, 3), np.float32)
        if images:
            batch[: len(images)] = np.stack(images)
        return kept, batch, errors

    n_ok = n_err = 0
    for kept, batch, errors in prefetch(_waves(_iter_paths(spec), wave_size),
                                        depth=2, transform=_decode_wave):
        for path, msg in errors:
            n_err += 1
            out.write(json.dumps({"path": path, "error": msg}) + "\n")
        if not kept:
            continue
        emb = np.asarray(encode(params, batch))[: len(kept)]     # [n, D]
        if mode == "embed":
            for path, e in zip(kept, emb):
                out.write(json.dumps({"path": path,
                                      "embedding": e.tolist()}) + "\n")
        else:
            sims = emb @ class_emb.T                             # [n, C]
            # class distribution at the model's own similarity temperature
            # (temp3, the gloria_global_loss scale — config model.loss)
            temp3 = float((cfg.model.get("loss") or {}).get("temp3", 10.0))
            z = sims * temp3
            ex = np.exp(z - z.max(axis=-1, keepdims=True))
            probs = ex / ex.sum(axis=-1, keepdims=True)
            for path, s, pr in zip(kept, sims, probs):
                k = int(np.argmax(s))
                out.write(json.dumps({
                    "path": path, "label": class_names[k],
                    "score": round(float(s[k]), 6),
                    "probs": {c: round(float(p), 6)
                              for c, p in zip(class_names, pr)}}) + "\n")
        n_ok += len(kept)
        out.flush()
    log.info(f"served {n_ok} images ({n_err} errors)")
    return 0 if n_ok or not n_err else 1


if __name__ == "__main__":
    sys.exit(main())
