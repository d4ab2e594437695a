#!/usr/bin/env python
"""Offline shard builder (reference scripts/*_webdataset.py family).

Reads dataset annotations, re-encodes images as JPEG q95, and writes
{__key__, jpg, txt, cls} tar shards with 10k samples/shard — the exact sample
schema the UniMed pipeline consumes (reference scripts/roco_webdataset.py:13-41).

One RECIPE per dataset reproduces the reference script's annotation parsing,
image-path construction, label derivation, and sample expansion exactly:

  * chexpert    — csv; ``filename``/``captions`` are single-quoted JSON lists
                  (reference chexpert_webdataset.py:18,25); one sample PER
                  caption template, key ``{idx:08d}_{l:08d}``, cls 0 (:29-37)
  * chestxray   — same csv convention, images under ``images/``
                  (chestxray_webdataset.py:19,29-37)
  * radimagenet — same csv convention; modality label from the image path:
                  CT→1, MR→2, UT→3 (radimagenet_webdataset.py:22-27); one
                  sample per caption, key ``{idx:08d}_{l:02d}`` (:36-43)
  * roco        — csv ID/caption/label; split dir (train/valid/test) chosen
                  by substring of the ID (roco_webdataset.py:16-22)
  * quilt       — csv image_path/caption/label under ``quilt_1m/``; unreadable
                  rows skipped (quilt_webdataset.py:17-37)
  * pmcoa       — jsonl image/caption/pmcoa_label under the subfigures dir
                  (pmcoa_webdataset.py:15-41)
  * generic     — csv/jsonl with --image-key/--caption-key/--label-key

``--mode join`` writes multi-template datasets as ONE sample whose caption is
every template joined by the dataset separator (medmoe_tpu/data/templates.py
draws one uniformly at load time) — ~K× smaller shards because the JPEG
bytes are stored once instead of once per template. NOT distribution-
identical to expand: each ROW appears once per epoch regardless of its
template count (expand weights rows by template count), and templates past
the loader's per-dataset cap (sample_caption's [0:10] split, reference
parity) are unreachable. ``--mode expand`` (default) matches the reference
bytes-for-bytes; use it when training parity matters.

Usage:
  python scripts/build_webdataset.py --dataset chexpert \
      --annotations chexpert_with_captions_only_frontal_view.csv \
      --image-root datasets/ --output out/dataset-%06d.tar
"""

from __future__ import annotations

import argparse
import csv
import io
import json
import os
import sys
from typing import Iterator, List, Optional, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medmoe_tpu.data.shard_writer import ShardWriter  # noqa: E402
from medmoe_tpu.data.templates import SEPARATORS  # noqa: E402

# (image_path, captions, label) per annotation row; None → skip the row
Sample = Tuple[str, List[str], object]


def _json_list(field: str) -> list:
    """The reference csvs store python-repr lists (single quotes):
    ``json.loads(row[...].replace("'", '"'))`` — reference
    chexpert_webdataset.py:18,25."""
    return json.loads(str(field).replace("'", '"'))


def read_csv(path: str) -> Iterator[dict]:
    with open(path, newline="") as f:
        yield from csv.DictReader(f)


def read_jsonl(path: str) -> Iterator[dict]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def read_annotations(path: str) -> Iterator[dict]:
    path = os.fspath(path)
    if path.endswith(".jsonl"):
        yield from read_jsonl(path)
    elif path.endswith(".json"):
        with open(path) as f:
            yield from json.load(f)
    else:
        yield from read_csv(path)


# --------------------------------------------------------------------------
# Per-dataset recipes (reference scripts/*_webdataset.py semantics)
# --------------------------------------------------------------------------

def recipe_chexpert(rec: dict, root: str) -> Optional[Sample]:
    img_id = _json_list(rec["filename"])[0]
    captions = [c.strip() for c in _json_list(rec["captions"])]
    return os.path.join(root, img_id), captions, 0


def recipe_chestxray(rec: dict, root: str) -> Optional[Sample]:
    img_id = _json_list(rec["filename"])[0]
    captions = [c.strip() for c in _json_list(rec["captions"])]
    return os.path.join(root, "images", img_id), captions, 0


def recipe_radimagenet(rec: dict, root: str) -> Optional[Sample]:
    img_id = _json_list(rec["filename"])[0]
    captions = [c.strip() for c in _json_list(rec["captions"])]
    # modality from the path (reference radimagenet_webdataset.py:22-27;
    # label space per scripts/label_roco.py: 1=CT, 2=MRI, 3=ultrasound)
    if "CT" in img_id:
        label = 1
    elif "MR" in img_id:
        label = 2
    elif "UT" in img_id:
        label = 3
    else:
        return None                       # reference would crash here
    return os.path.join(root, img_id), captions, label


def recipe_roco(rec: dict, root: str) -> Optional[Sample]:
    img_id = rec["ID"]
    split = "train" if "train" in img_id \
        else ("valid" if "valid" in img_id else "test")
    return (os.path.join(root, split, img_id + ".jpg"),
            [rec["caption"].strip()], rec["label"])


def recipe_quilt(rec: dict, root: str) -> Optional[Sample]:
    return (os.path.join(root, "quilt_1m", rec["image_path"]),
            [rec["caption"].strip()], rec["label"])


def recipe_pmcoa(rec: dict, root: str) -> Optional[Sample]:
    sub = "caption_T060_filtered_top4_sep_v0_subfigures"
    return (os.path.join(root, sub, rec["image"]),
            [rec["caption"].strip()], rec["pmcoa_label"])


RECIPES = {
    "chexpert": recipe_chexpert,
    "chestxray": recipe_chestxray,
    "radimagenet": recipe_radimagenet,
    "roco": recipe_roco,
    "quilt": recipe_quilt,
    "pmcoa": recipe_pmcoa,
}

# reference key formats: chexpert/chestxray ``{idx:08d}_{l:08d}``,
# radimagenet ``{idx:08d}_{l:02d}`` (its caption count is single-digit);
# these three ALWAYS carry the template suffix (the reference loops over
# captions unconditionally), the single-caption datasets never do
KEY_WIDTH = {"radimagenet": 2}
TEMPLATE_DATASETS = {"chexpert", "chestxray", "radimagenet"}


def make_generic_recipe(image_key: str, caption_key: str, label_key: str):
    def recipe(rec: dict, root: str) -> Optional[Sample]:
        img_path = rec.get(image_key) or rec.get("image_path") \
            or rec.get("Path") or ""
        if root and not os.path.isabs(img_path):
            img_path = os.path.join(root, img_path)
        captions = rec.get(caption_key) or rec.get("text") \
            or rec.get("Report Impression") or ""
        if not isinstance(captions, list):
            captions = [str(captions)]
        label = rec.get(label_key, rec.get("label", 0)) or 0
        return img_path, [str(c).strip() for c in captions], label
    return recipe


def reencode_jpeg(path: str, quality: int = 95) -> bytes:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def build(dataset: str, annotations: str, image_root: str, output: str,
          mode: str = "expand", maxcount: int = 10_000,
          image_key: str = "image", caption_key: str = "caption",
          label_key: str = "cls", verbose: bool = True) -> dict:
    recipe = RECIPES.get(dataset) or make_generic_recipe(
        image_key, caption_key, label_key)
    sep = SEPARATORS.get(dataset)
    lw = KEY_WIDTH.get(dataset, 8)
    written = skipped = 0
    with ShardWriter(output, maxcount=maxcount) as writer:
        for idx, rec in enumerate(read_annotations(annotations)):
            try:
                parsed = recipe(rec, image_root)
                if parsed is None:
                    skipped += 1
                    continue
                img_path, captions, label = parsed
                # validate at build time, not mid-epoch: the loaders do
                # int(sample['cls']), so a '4.0'/non-numeric annotation
                # label must fail HERE (as a skipped row), not in training
                label = int(float(str(label).strip() or 0))
                jpg = reencode_jpeg(img_path)
            except Exception:
                # reference quilt swallows per-row errors; others would
                # crash — nothrow uniformly, report the count
                skipped += 1
                continue

            suffixed = dataset in TEMPLATE_DATASETS or len(captions) > 1
            if mode == "expand" or len(captions) == 1:
                for l_idx, caption in enumerate(captions):
                    writer.write({
                        "__key__": (f"{idx:08d}_{l_idx:0{lw}d}"
                                    if suffixed else f"{idx:08d}"),
                        "jpg": jpg, "txt": caption, "cls": label})
                    written += 1
            else:                          # join: one sample, all templates
                writer.write({"__key__": f"{idx:08d}", "jpg": jpg,
                              "txt": (sep or "|").join(captions),
                              "cls": label})
                written += 1
            if verbose and written and written % 1000 == 0:
                print(f"{written} written ({skipped} skipped)", flush=True)
        shards = writer.shard_index
    if verbose:
        print(f"done: {written} samples, {skipped} skipped, {shards} shards")
    return {"written": written, "skipped": skipped, "shards": shards}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    choices=sorted(RECIPES) + ["generic"])
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--image-root", default="")
    ap.add_argument("--output", required=True,
                    help="pattern like dir/dataset-%%06d.tar")
    ap.add_argument("--mode", choices=["expand", "join"], default="expand",
                    help="expand: one sample per caption template "
                         "(reference); join: separator-joined single sample "
                         "(load-time template sampling)")
    ap.add_argument("--maxcount", type=int, default=10_000)
    ap.add_argument("--image-key", default="image",
                    help="generic: annotation field holding the image path")
    ap.add_argument("--caption-key", default="caption")
    ap.add_argument("--label-key", default="cls")
    args = ap.parse_args()
    build(args.dataset, args.annotations, args.image_root, args.output,
          mode=args.mode, maxcount=args.maxcount, image_key=args.image_key,
          caption_key=args.caption_key, label_key=args.label_key)


if __name__ == "__main__":
    main()
