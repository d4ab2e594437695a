#!/usr/bin/env python
"""Offline shard builder (reference scripts/*_webdataset.py family).

Reads dataset annotations (csv or jsonl), re-encodes images as JPEG q95, and
writes {__key__, jpg, txt, cls} tar shards with 10k samples/shard — the exact
sample schema the UniMed pipeline consumes (reference
scripts/roco_webdataset.py:13-41). Datasets whose annotations carry multiple
caption templates are written with the reference's separator convention
(e.g. one string joined by '_chexpert_') so load-time template sampling
(medmoe_tpu/data/templates.py) behaves identically.

Usage:
  python scripts/build_webdataset.py --dataset roco \
      --annotations data/roco/annotations.csv --image-root data/roco/images \
      --output data/roco_webdataset/dataset-%06d.tar
"""

from __future__ import annotations

import argparse
import csv
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medmoe_tpu.data.shard_writer import ShardWriter  # noqa: E402

SEPARATORS = {
    "radimagenet": "_radimagenet_",
    "chexpert": "_chexpert_",
    "chestxray": "_chestxray8_",
    "openi": "_openi_",
    "mimiccxr": "_mimiccxr_",
}


def read_annotations(path: str):
    if path.endswith(".jsonl"):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)
    elif path.endswith(".json"):
        with open(path) as f:
            yield from json.load(f)
    else:
        with open(path, newline="") as f:
            yield from csv.DictReader(f)


def reencode_jpeg(path: str, quality: int = 95) -> bytes:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    choices=["roco", "pmcoa", "quilt", "radimagenet",
                             "chexpert", "chestxray"])
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--image-root", default="")
    ap.add_argument("--output", required=True,
                    help="pattern like dir/dataset-%%06d.tar")
    ap.add_argument("--maxcount", type=int, default=10_000)
    ap.add_argument("--image-key", default="image",
                    help="annotation field holding the image path")
    ap.add_argument("--caption-key", default="caption")
    ap.add_argument("--label-key", default="cls")
    args = ap.parse_args()

    sep = SEPARATORS.get(args.dataset)
    written = skipped = 0
    with ShardWriter(args.output, maxcount=args.maxcount) as writer:
        for i, rec in enumerate(read_annotations(args.annotations)):
            img_path = rec.get(args.image_key) or rec.get("image_path") \
                or rec.get("Path") or ""
            if args.image_root and not os.path.isabs(img_path):
                img_path = os.path.join(args.image_root, img_path)
            try:
                jpg = reencode_jpeg(img_path)
            except Exception:
                skipped += 1
                continue

            captions = rec.get(args.caption_key) or rec.get("text") \
                or rec.get("Report Impression") or ""
            if isinstance(captions, list):
                # multi-template datasets: one sample carrying every template
                # joined by the dataset separator (reference
                # scripts/chexpert_webdataset.py:29-37)
                txt = (sep or "|").join(str(c) for c in captions)
            else:
                txt = str(captions)

            cls = int(rec.get(args.label_key, rec.get("label", 0)) or 0)
            writer.write({"__key__": f"{written:09d}", "jpg": jpg,
                          "txt": txt, "cls": cls})
            written += 1
            if written % 1000 == 0:
                print(f"{written} written ({skipped} skipped)", flush=True)
    print(f"done: {written} samples, {skipped} skipped, "
          f"{writer.shard_index} shards")


if __name__ == "__main__":
    main()
