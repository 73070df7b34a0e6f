#!/usr/bin/env python
"""Build a face record store from a folder-of-images tree (offline tool).

Equivalent of the reference's LMDB builder (/root/reference/data/creat_lmdb.py:45-70):
walks ``<src>/<identity_dir>/<image files>``, resizes to --image_size,
JPEG-encodes, and writes a FaceRecordReader-compatible store — but with one
coherent record format end-to-end (the reference wrote raw JPEG and read
Datum protobufs; SURVEY.md §0).

Usage:
    python tools/make_dataset.py --src ./faces --out ./store [--image_size 224]
    python tools/make_dataset.py --synthetic --out ./store --num_ids 1000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vlsfr_tpu.data.records import FaceRecordWriter  # noqa: E402

IMG_EXT = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def make_store(src: str, out: str, image_size: int, db_name: str, quality: int = 92) -> int:
    import cv2
    from tqdm import tqdm

    id_dirs = sorted(d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d)))
    n = 0
    with FaceRecordWriter(out) as w:
        for label, id_dir in enumerate(tqdm(id_dirs, desc="identities")):
            files = sorted(
                f
                for f in os.listdir(os.path.join(src, id_dir))
                if os.path.splitext(f)[1].lower() in IMG_EXT
            )
            for j, fname in enumerate(files):
                img = cv2.imread(os.path.join(src, id_dir, fname))
                if img is None:
                    print(f"warning: unreadable {id_dir}/{fname}, skipped", file=sys.stderr)
                    continue
                img = cv2.resize(img, (image_size, image_size))
                ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality])
                if not ok:
                    print(f"warning: encode failed {id_dir}/{fname}", file=sys.stderr)
                    continue
                w.add(f"{db_name}_{label}_{j}", label, buf.tobytes())
                n += 1
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", type=str, default="", help="folder-of-identity-folders source")
    ap.add_argument("--out", type=str, required=True, help="output store directory")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--db_name", type=str, default="train")
    ap.add_argument("--quality", type=int, default=92)
    ap.add_argument("--synthetic", action="store_true", help="generate synthetic data instead")
    ap.add_argument("--num_ids", type=int, default=100)
    ap.add_argument("--images_per_id", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.synthetic:
        from vlsfr_tpu.data.synthetic import generate_synthetic_store

        generate_synthetic_store(
            args.out, args.num_ids, args.images_per_id, args.image_size, args.seed, args.db_name
        )
        print(f"wrote synthetic store: {args.num_ids} ids × {args.images_per_id} → {args.out}")
    else:
        assert args.src, "--src required without --synthetic"
        n = make_store(args.src, args.out, args.image_size, args.db_name, args.quality)
        print(f"wrote {n} records → {args.out}")


if __name__ == "__main__":
    main()
