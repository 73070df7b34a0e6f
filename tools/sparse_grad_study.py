#!/usr/bin/env python
"""Accuracy study: does the truncated sparse-d_w streaming backward reach
dense-gradient accuracy?

Trains the full_softmax head twice on the SAME hard synthetic store
(identities are perturbations of a shared manifold — verification accuracy
measures learned discrimination, data/synthetic.py): once with the exact
dense streaming gradient, once with the sparse-d_w backward truncated to
``--rate`` of the class tiles (the loss itself stays exact in both). Reports
the held-out verification accuracy of each.

Defaults are sized so the truncation actually bites (kept tiles ≪ n_tiles)
while staying CPU-runnable:

    JAX_PLATFORMS=cpu python tools/sparse_grad_study.py \
        --ids 16384 --rate 0.1 --epochs 2

Results are recorded in docs/PERF.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_config(store: str, sparse: bool, args) -> dict:
    from vlsfr_tpu.config import Config
    from vlsfr_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.net_type = "toy"
    cfg.model.feat_dim = 32
    cfg.model.dtype = "float32"
    cfg.data.sources = [store]
    cfg.data.batch_size = args.batch
    cfg.data.image_size = 32
    cfg.data.num_workers = 2
    cfg.pool.head = "full_softmax"
    cfg.pool.use_fused = "on"
    cfg.pool.sparse_update = sparse
    cfg.pool.sparse_grad_rate = args.rate
    cfg.optim.lr = args.lr
    cfg.optim.epochs = args.epochs
    cfg.optim.milestones = [max(args.epochs - 1, 1)]
    cfg.optim.gammas = [0.1]
    cfg.train.saved_dir = tempfile.mkdtemp(prefix="sparse_study_")
    cfg.train.print_freq = 500
    cfg.train.save_freq = 10**9
    cfg.train.holdout_records = args.holdout
    cfg.train.eval_records = 512
    cfg.train.eval_pairs = 600
    t = Trainer(cfg)
    t.train()
    ev = t.evaluate()
    t.close()
    return ev


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ids", type=int, default=16384)
    ap.add_argument("--images_per_id", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rate", type=float, default=0.1)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--holdout", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from vlsfr_tpu.data.synthetic import generate_synthetic_store
    from vlsfr_tpu.ops.margin_pallas import sparse_bwd_geometry

    tile, n_tiles = sparse_bwd_geometry(args.batch, 32, args.ids)
    m_tiles = min(n_tiles, max(int(round(args.rate * n_tiles)), args.batch, 8))
    print(f"C={args.ids} tile={tile} n_tiles={n_tiles} kept={m_tiles} "
          f"({m_tiles / n_tiles:.0%} of tiles; truncation bites iff < 100%)")

    store = tempfile.mkdtemp(prefix="sparse_study_store_")
    generate_synthetic_store(store, num_ids=args.ids, images_per_id=args.images_per_id,
                             image_size=32, seed=args.seed, hard=True)
    print("store ready:", store)

    dense = run_config(store, sparse=False, args=args)
    print("dense streaming   :", dense)
    sparse = run_config(store, sparse=True, args=args)
    print("sparse-d_w (trunc):", sparse)
    key = "verification_acc_holdout"
    print(f"RESULT dense={dense.get(key):.4f} sparse={sparse.get(key):.4f} "
          f"delta={sparse.get(key) - dense.get(key):+.4f}")


if __name__ == "__main__":
    main()
