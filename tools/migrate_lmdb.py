#!/usr/bin/env python
"""Migrate a reference LMDB dataset (+ train_kv.txt manifest) to a
vlsfr_tpu record store.

For users of the reference (/root/reference/data/creat_lmdb.py produced
``<lmdb_dir>`` + ``train_kv.txt`` with "key label" lines; values are raw
JPEG bytes). Requires the ``lmdb`` package (pip install lmdb) — not bundled
here; this tool is gated on its presence.

Usage:
    python tools/migrate_lmdb.py --lmdb ./data/lmdb \
        --manifest ./data/lmdb/train_kv.txt --out ./store
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vlsfr_tpu.data.records import FaceRecordWriter  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lmdb", required=True, help="reference LMDB directory")
    ap.add_argument("--manifest", required=True, help="train_kv.txt ('key label' lines)")
    ap.add_argument("--out", required=True, help="output record-store directory")
    args = ap.parse_args()

    try:
        import lmdb
    except ImportError:
        sys.exit("the 'lmdb' package is required for migration: pip install lmdb")

    env = lmdb.open(args.lmdb, readonly=True, lock=False, readahead=False)
    n, missing = 0, 0
    with env.begin(write=False) as txn, FaceRecordWriter(args.out) as w:
        with open(args.manifest) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                key, label = line.rsplit(" ", 1)
                payload = txn.get(key.encode("utf-8"))
                if payload is None:
                    missing += 1
                    continue
                w.add(key, int(label), bytes(payload))
                n += 1
    env.close()
    print(f"migrated {n} records → {args.out}" + (f" ({missing} manifest keys missing)" if missing else ""))


if __name__ == "__main__":
    main()
