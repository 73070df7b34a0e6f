#!/usr/bin/env python
"""Export balanced verification pairs from record store(s) to an
insightface-style ``.bin`` (the ecosystem-standard eval format — lfw.bin,
cfp_fp.bin, agedb_30.bin all follow it).

Usage:
    python tools/make_bin.py --store /data/casia --out casia_val.bin \
        --num_pairs 6000 [--seed 0]

The result round-trips through eval/verification.load_insightface_bin and
plugs into ``tools/evaluate.py --bin`` and ``--set train.eval_bin=...``
(in-training eval). The reference has no eval tooling at all (SURVEY.md §3.5).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", nargs="+", required=True, help="record store dirs")
    ap.add_argument("--out", required=True, help="output .bin path")
    ap.add_argument("--num_pairs", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from vlsfr_tpu.eval.verification import make_bin_from_store

    n = make_bin_from_store(args.store, args.out, args.num_pairs, seed=args.seed)
    print(f"wrote {n} pairs ({2 * n} images) to {args.out}")


if __name__ == "__main__":
    main()
