#!/usr/bin/env python
"""Evaluate a trained checkpoint: verification (1:1) + identification (1:N).

The inference path the reference never shipped (SURVEY.md §3.5). Loads the
latest (or given) checkpoint from a vlsfr_tpu training run, extracts
embeddings for a record store, and reports LFW-protocol verification
accuracy, TAR@FAR, and rank-1 identification.

Usage:
    python tools/evaluate.py --ckpt ./checkpoint --store ./store \
        --net_type r50 --feat_dim 512 [--num_pairs 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="training saved_dir")
    ap.add_argument("--store", nargs="*", default=[])
    ap.add_argument("--bin", dest="bin_files", nargs="*", default=[],
                    help="insightface-style verification .bin files (lfw.bin ...)")
    ap.add_argument("--net_type", default="r50")
    ap.add_argument("--feat_dim", type=int, default=512)
    ap.add_argument("--image_size", type=int, default=0)
    ap.add_argument("--num_pairs", type=int, default=2000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--step", type=int, default=-1, help="checkpoint step (-1 = latest)")
    ap.add_argument("--ema", action="store_true",
                    help="FFC checkpoints: evaluate the EMA gallery net "
                         "instead of the probe net")
    ap.add_argument("--int8", action="store_true",
                    help="serve the forward with int8 convs (ops/quant.py "
                         "— 1.5-3.6x conv throughput on v5e, drift within "
                         "the 0.999 cosine gate)")
    args = ap.parse_args()

    import jax
    import orbax.checkpoint as ocp

    from vlsfr_tpu.data.records import MultiSourceReader
    from vlsfr_tpu.eval.extract import Embedder
    from vlsfr_tpu.eval.verification import (
        cosine_scores,
        identification_topk,
        kfold_verification_accuracy,
        make_verification_pairs,
        tar_at_far,
    )
    from vlsfr_tpu.models import create_net, native_image_size

    size = args.image_size or native_image_size(args.net_type)
    model = create_net(args.net_type, feat_dim=args.feat_dim)

    mngr = ocp.CheckpointManager(os.path.abspath(args.ckpt))
    step = args.step if args.step >= 0 else mngr.latest_step()
    assert step is not None, f"no checkpoints in {args.ckpt}"
    restored = mngr.restore(step)["state"]
    which = "gallery" if args.ema else "probe"
    assert f"{which}_params" in restored, (
        f"checkpoint has no {which}_params (softmax-head checkpoints store "
        "params/backbone; --ema applies to FFC checkpoints only)")
    variables = {
        "params": restored[f"{which}_params"],
        "batch_stats": restored[f"{which}_stats"],
    }

    emb = Embedder(model, variables, batch_size=args.batch_size,
                   int8=args.int8)
    report = {"checkpoint_step": int(step)}

    if args.store:
        reader = MultiSourceReader(args.store)
        embeddings = emb.from_reader(reader, size)
        labels = np.asarray(reader.labels)
        i1, i2, issame = make_verification_pairs(labels, args.num_pairs)
        scores = cosine_scores(embeddings[i1], embeddings[i2])
        acc, std = kfold_verification_accuracy(scores, issame)
        # 1:N — first image per identity is the gallery, the rest are probes
        first, g_idx, p_idx = {}, [], []
        for i, l in enumerate(labels):
            if int(l) not in first:
                first[int(l)] = i
                g_idx.append(i)
            else:
                p_idx.append(i)
        rank1 = identification_topk(
            embeddings[g_idx], labels[g_idx], embeddings[p_idx], labels[p_idx], k=1
        ) if p_idx else float("nan")
        report.update(
            records=len(reader),
            verification_acc=round(acc, 4),
            verification_std=round(std, 4),
            tar_at_far1e_3=round(tar_at_far(scores, issame, 1e-3), 4),
            rank1_identification=round(rank1, 4),
        )
        reader.close()

    for bin_path in args.bin_files:
        from vlsfr_tpu.eval.verification import evaluate_bin

        name = os.path.splitext(os.path.basename(bin_path))[0]
        res = evaluate_bin(emb, bin_path, size)
        report[name] = {k: round(v, 4) if isinstance(v, float) else v for k, v in res.items()}

    print(json.dumps(report))


if __name__ == "__main__":
    main()
