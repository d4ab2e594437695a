"""Serving export: serialize the deployed encoders to StableHLO artifacts.

The reference has no deployment story beyond "load the Lightning
checkpoint in torch"; a TPU-native framework's equivalent is
``jax.export``: the jitted encoder — weights baked in as constants — is
lowered once to versioned StableHLO and shipped as a single file that any
later jax/XLA runtime (or a C++ PJRT host, no Python model code at all)
can load and run. Two artifacts:

  * ``encode_image.jaxexport`` — f32[b, H, W, 3] (host-normalized, NHWC)
    → L2-normalized f32[b, D] global embeddings. The batch dim ``b`` is
    SYMBOLIC (shape-polymorphic export), so one artifact serves any wave
    size.
  * ``encode_text.jaxexport`` — (input_ids, attention_mask,
    token_type_ids, segment_ids) i32[b, T] → L2-normalized f32[b, D]
    sentence embeddings (tokenization stays on the host: the manifest
    records vocab/max_length so the serving host reproduces it).

plus ``manifest.json`` (shapes, dtypes, normalization stats, prompt
template, platform list) — everything a serving host needs and nothing it
must guess.

Portability note: export forces the EXPERT branch onto the pure-XLA path
(MEDMOE_EXPERT_IMPL=xla) so the artifact contains no Mosaic custom calls
and runs on any platform in ``platforms``; peak single-chip TPU serving
(the fused Pallas branch) stays available by serving the live module
(cli/serve.py) instead of the artifact.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)

_IMAGE_NAME = "encode_image.jaxexport"
_TEXT_NAME = "encode_text.jaxexport"
_WEIGHTS_NAME = "weights.npz"
_MANIFEST = "manifest.json"


def _save_weights(path: str, params) -> None:
    """Flatten the param tree to '/'-joined keys → one npz file."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:       # npz has no bf16
            arr = arr.astype(np.float32)
        flat[key] = arr
    np.savez(path, **flat)


def load_weights(export_dir: str):
    """weights.npz → nested param dict (inverse of _save_weights)."""
    loaded = np.load(os.path.join(export_dir, _WEIGHTS_NAME))
    tree: Dict[str, Any] = {}
    for key in loaded.files:
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = loaded[key]
    return tree


def call_exported(export_dir: str, which: str):
    """Load one artifact as a plain callable: images→emb / tokens→emb.
    Handles both weight modes (baked constants vs weights.npz arg). The
    manifest's ``weights`` field is authoritative when present (a bare
    weights.npz left behind by an older export must not be trusted)."""
    from jax import export as jexport

    name = {"image": _IMAGE_NAME, "text": _TEXT_NAME}[which]
    with open(os.path.join(export_dir, name), "rb") as f:
        art = jexport.deserialize(f.read())
    manifest_path = os.path.join(export_dir, _MANIFEST)
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            unbaked = json.load(f).get("weights") == _WEIGHTS_NAME
    else:
        unbaked = os.path.exists(os.path.join(export_dir, _WEIGHTS_NAME))
    if unbaked:
        weights = load_weights(export_dir)
        return lambda *inputs: art.call(weights, *inputs)
    return art.call


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _l2(x):
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def export_encoders(module, params, out_dir: str,
                    platforms: Sequence[str] = ("cpu", "tpu"),
                    batch: Optional[int] = None,
                    bake_weights: bool = True,
                    check: bool = True) -> Dict[str, Any]:
    """Write the two encoder artifacts + manifest to ``out_dir``.

    ``batch=None`` exports a symbolic batch dimension; an int pins it
    (some consumers want fully static artifacts). ``bake_weights=False``
    exports the weights as a FUNCTION ARGUMENT instead of baked constants:
    the program shrinks from hundreds of MB to ~MB (serving stacks with
    program-size caps — including this harness's remote-compile proxy,
    which rejects the 342 MB baked BERT program — need this form) and the
    weights ship alongside as ``weights.npz`` (load_weights/call_exported
    below reassemble the tree). Returns the manifest. ``check=True``
    deserializes each artifact and asserts parity with the live jitted
    module on a random batch before reporting success."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    vision = module.vision_cfg
    text = module.text_cfg
    size = int(vision["image_size"])
    t_len = int(text["max_length"])

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)

    prev_impl = os.environ.get("MEDMOE_EXPERT_IMPL")
    os.environ["MEDMOE_EXPERT_IMPL"] = "xla"   # no Mosaic custom calls
    try:
        if bake_weights:
            def encode_image(images):
                g, _, _ = module.model.apply(
                    {"params": params}, images,
                    method=lambda m, im: m.encode_image(
                        im, deterministic=True))
                return _l2(g)

            def encode_text(ids, mask, types, segs):
                _, sent = module.model.apply(
                    {"params": params}, ids, mask, types, segs,
                    method=lambda m, *a: m.encode_text(
                        *a, deterministic=True))
                return _l2(sent)

            img_in = (_sds((b, size, size, 3), jnp.float32),)
            txt_in = tuple([_sds((b, t_len), jnp.int32)] * 4)
        else:
            def encode_image(p, images):
                g, _, _ = module.model.apply(
                    {"params": p}, images,
                    method=lambda m, im: m.encode_image(
                        im, deterministic=True))
                return _l2(g)

            def encode_text(p, ids, mask, types, segs):
                _, sent = module.model.apply(
                    {"params": p}, ids, mask, types, segs,
                    method=lambda m, *a: m.encode_text(
                        *a, deterministic=True))
                return _l2(sent)

            p_avals = jax.tree_util.tree_map(
                lambda x: _sds(x.shape, x.dtype), params)
            img_in = (p_avals, _sds((b, size, size, 3), jnp.float32))
            txt_in = (p_avals,) + tuple([_sds((b, t_len), jnp.int32)] * 4)

        img_exp = jexport.export(jax.jit(encode_image),
                                 platforms=tuple(platforms))(*img_in)
        txt_exp = jexport.export(jax.jit(encode_text),
                                 platforms=tuple(platforms))(*txt_in)
    finally:
        if prev_impl is None:
            os.environ.pop("MEDMOE_EXPERT_IMPL", None)
        else:
            os.environ["MEDMOE_EXPERT_IMPL"] = prev_impl

    if not bake_weights:
        _save_weights(os.path.join(out_dir, _WEIGHTS_NAME), params)
    else:
        # a baked re-export into a dir that previously held an unbaked one
        # must not leave the stale weights file behind
        stale = os.path.join(out_dir, _WEIGHTS_NAME)
        if os.path.exists(stale):
            os.remove(stale)

    img_path = os.path.join(out_dir, _IMAGE_NAME)
    txt_path = os.path.join(out_dir, _TEXT_NAME)
    with open(img_path, "wb") as f:
        f.write(img_exp.serialize())
    with open(txt_path, "wb") as f:
        f.write(txt_exp.serialize())

    embed_dim = int(img_exp.out_avals[0].shape[-1])
    manifest = {
        "format": "jax.export StableHLO",
        "platforms": list(platforms),
        "embed_dim": embed_dim,
        "image": {
            "file": _IMAGE_NAME,
            "input": f"float32[{'b' if batch is None else batch},"
                     f"{size},{size},3]",
            "layout": "NHWC, host-normalized",
            "norm_stats": vision.get("norm_stats", "imagenet"),
            "output": "float32[b, D] L2-normalized",
        },
        "text": {
            "file": _TEXT_NAME,
            "inputs": ["input_ids", "attention_mask", "token_type_ids",
                       "segment_ids"],
            "input_shape": f"int32[{'b' if batch is None else batch},"
                           f"{t_len}]",
            "max_length": t_len,
            "tokenizer": "WordPiece + merged-word segment_ids "
                         "(medmoe_tpu/data/tokenizer.py)",
            "output": "float32[b, D] L2-normalized",
        },
        "weights": "baked" if bake_weights else _WEIGHTS_NAME,
        "prompt_template": "this is a photo of {}",
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)

    if check:
        # the roundtrip executes the artifact on THIS host's backend;
        # exporting for platforms that exclude it (e.g. platforms=[tpu]
        # from a CPU dev box — a supported flow, lowering is rule-based)
        # must not fail a successful export with a call-time error
        host = jax.default_backend()
        if host in platforms:
            _roundtrip_check(module, params, img_path, txt_path, size,
                             t_len, int(text.get("vocab_size", 64)),
                             check_b=int(batch) if batch is not None else 2)
        else:
            log.warning(
                f"skipping export roundtrip check: host backend '{host}' "
                f"is not in platforms={list(platforms)} — the artifact "
                f"cannot execute here; validate on a target platform")
    log.info(f"exported encoders to {out_dir} "
             f"(D={embed_dim}, platforms={list(platforms)})")
    return manifest


def _roundtrip_check(module, params, img_path, txt_path, size, t_len,
                     vocab, check_b: int = 2) -> None:
    """Deserialize both artifacts and assert parity with the live module
    (pure-XLA expert path on both sides) on a random batch."""
    from jax import export as jexport

    rng = np.random.RandomState(0)
    images = rng.rand(check_b, size, size, 3).astype(np.float32)
    ids = rng.randint(1, vocab, size=(check_b, t_len)).astype(np.int32)
    mask = np.ones((check_b, t_len), np.int32)
    types = np.zeros((check_b, t_len), np.int32)
    segs = np.tile(np.arange(t_len, dtype=np.int32), (check_b, 1))

    prev_impl = os.environ.get("MEDMOE_EXPERT_IMPL")
    os.environ["MEDMOE_EXPERT_IMPL"] = "xla"
    try:
        live_img = np.asarray(_l2(module.model.apply(
            {"params": params}, jnp.asarray(images),
            method=lambda m, im: m.encode_image(im, deterministic=True))[0]))
        live_txt = np.asarray(_l2(module.model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(types), jnp.asarray(segs),
            method=lambda m, *a: m.encode_text(*a, deterministic=True))[1]))
    finally:
        if prev_impl is None:
            os.environ.pop("MEDMOE_EXPERT_IMPL", None)
        else:
            os.environ["MEDMOE_EXPERT_IMPL"] = prev_impl

    export_dir = os.path.dirname(img_path)
    got_img = np.asarray(call_exported(export_dir, "image")(images))
    got_txt = np.asarray(call_exported(export_dir, "text")(
        ids, mask, types, segs))
    for name, got, want in (("image", got_img, live_img),
                            ("text", got_txt, live_txt)):
        err = np.abs(got - want).max()
        # outputs are unit-norm embeddings: 2e-3 abs admits XLA's bf16
        # reassociation noise between the symbolic-batch artifact and the
        # static-batch live jit (measured 1.05e-4 image / 7.3e-4 text at
        # full 224px/12-layer size) while wrong/permuted weights give
        # O(1) errors
        if err > 2e-3:
            raise AssertionError(
                f"exported {name} encoder diverges from the live module "
                f"(max abs err {err:.2e})")
