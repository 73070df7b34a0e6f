#!/usr/bin/env python
"""Inspect a face record store (offline tool).

Equivalent of the reference's visual LMDB checker
(/root/reference/data/test_lmdb.py:5-27) but headless-friendly: prints store
stats, verifies every payload decodes, and optionally dumps sample images.

Usage:
    python tools/inspect_dataset.py --store ./store [--dump_dir ./samples -n 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from vlsfr_tpu.data.records import MultiSourceReader  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", nargs="+", required=True)
    ap.add_argument("--dump_dir", type=str, default="")
    ap.add_argument("-n", type=int, default=8, help="samples to dump")
    ap.add_argument("--verify_all", action="store_true", help="decode every record")
    args = ap.parse_args()

    import cv2

    reader = MultiSourceReader(args.store)
    labels = reader.labels
    print(f"records:     {len(reader)}")
    print(f"identities:  {len(np.unique(labels))} (num_class={reader.num_class})")
    if len(reader):
        counts = np.bincount(labels)
        counts = counts[counts > 0]
        print(f"imgs/id:     min={counts.min()} mean={counts.mean():.1f} max={counts.max()}")

    check = range(len(reader)) if args.verify_all else range(min(args.n, len(reader)))
    bad = 0
    for i in check:
        img = cv2.imdecode(np.frombuffer(reader.payload(i), np.uint8), cv2.IMREAD_UNCHANGED)
        if img is None:
            bad += 1
            print(f"  record {i}: DECODE FAILED")
    print(f"decode check: {len(list(check))} records, {bad} failures")

    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)
        for i in range(min(args.n, len(reader))):
            img = cv2.imdecode(np.frombuffer(reader.payload(i), np.uint8), cv2.IMREAD_UNCHANGED)
            cv2.imwrite(os.path.join(args.dump_dir, f"sample_{i}_label{reader.label(i)}.jpg"), img)
        print(f"dumped {min(args.n, len(reader))} samples → {args.dump_dir}")
    reader.close()


if __name__ == "__main__":
    main()
