"""CASIA-scale accuracy study (round-2 verdict item 4): ~10.5k identities
(the reference trained on CASIA-WebFace, /root/reference/recognition/001.md:5),
hard-synthetic images, REAL training on the TPU with the full held-out eval
path — verification accuracy, TAR@FAR, 1:N identification — plus the
foreign-format .bin eval (tools/cross_stack_eval.pack_bin_insightface_style,
a file this repo's writer did not produce).

Heads compared at identical budgets: FFC (DCP queue ≪ #ids) vs full
softmax (the accuracy ceiling FFC claims to match, arXiv 2105.10375).

Run (TPU, background — generation ~10 min on this 1-core host, training is
host-decode-bound):
    python tools/casia_scale_study.py --ids 10500 --images_per_id 12 \
        --epochs 3 --out docs/ACCURACY.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def full_eval(trainer, n_pairs=3000, bin_path=None):
    """Held-out eval beyond Trainer.evaluate: verification + TAR@FAR +
    1:N identification + optional foreign-bin verification."""
    import jax.numpy as jnp

    from vlsfr_tpu.eval.extract import Embedder
    from vlsfr_tpu.eval.verification import (
        cosine_scores,
        identification_topk,
        kfold_verification_accuracy,
        make_verification_pairs,
        tar_at_far,
    )

    reader = trainer.reader
    assert trainer.record_limit is not None, "study requires a holdout split"
    pool = np.arange(trainer.record_limit, len(reader))
    labels = np.asarray([reader.label(int(i)) for i in pool])
    emb = Embedder(trainer.model, trainer._eval_variables(), batch_size=128)
    t0 = time.time()
    embeddings = emb.from_reader(reader, trainer.image_size, indices=pool)
    i1, i2, issame = make_verification_pairs(labels, n_pairs, seed=1)
    scores = cosine_scores(embeddings[i1], embeddings[i2])
    acc, std = kfold_verification_accuracy(scores, issame)
    out = {
        "holdout_records": int(len(pool)),
        "holdout_ids": int(len(np.unique(labels))),
        "verification_acc": round(float(acc), 4),
        "verification_std": round(float(std), 4),
        "tar_at_far_1e2": round(float(tar_at_far(scores, issame, 1e-2)), 4),
        "tar_at_far_1e3": round(float(tar_at_far(scores, issame, 1e-3)), 4),
        "eval_seconds": round(time.time() - t0, 1),
    }
    # 1:N identification: first image per id = gallery, rest = probes
    first = {}
    gallery_idx, probe_idx = [], []
    for j, l in enumerate(labels):
        if l not in first:
            first[l] = j
            gallery_idx.append(j)
        else:
            probe_idx.append(j)
    if probe_idx:
        gi, pi = np.asarray(gallery_idx), np.asarray(probe_idx)
        for kk, name in ((1, "ident_rank1"), (5, "ident_rank5")):
            out[name] = round(identification_topk(
                embeddings[gi], labels[gi], embeddings[pi], labels[pi], k=kk), 4)
    if bin_path and os.path.exists(bin_path):
        try:
            from vlsfr_tpu.eval.verification import evaluate_bin

            res = evaluate_bin(emb, bin_path, trainer.image_size)
            out.update({f"bin_{k}": round(float(v), 4) for k, v in res.items()})
        except Exception as e:  # noqa: BLE001 — report, don't lose the run
            out["bin_error"] = str(e)[:200]
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ids", type=int, default=10500)
    ap.add_argument("--images_per_id", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--net", default="mobile")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--queue", type=int, default=16384)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--heads", nargs="*", default=["ffc", "full_softmax"])
    ap.add_argument("--store", default="/root/casia_syn_store")
    # per-image coefficient-space jitter (data/synthetic.py): sets a
    # Bayes-optimal verification ceiling (~0.94 at 0.20) so the study can
    # actually detect regressions — the round-3 verdict's "saturated
    # benchmark" fix. 0.0 reproduces the round-3 store.
    ap.add_argument("--coef_jitter", type=float, default=0.0)
    ap.add_argument("--out", default="")
    # perf-config accuracy probes (full_softmax head): force the streaming
    # fused path and its storage dtypes to validate the bench configuration
    # end-task (docs/PERF.md bf16-momentum study)
    ap.add_argument("--use_fused", default="auto")
    ap.add_argument("--cls_dtype", default="float32")
    ap.add_argument("--mom_dtype", default="float32")
    # ffc head: DCP pool storage dtype (float32 | bfloat16 | int8 — int8
    # needs --use_fused on at queue sizes below the streaming threshold)
    ap.add_argument("--queue_dtype", default="float32")
    # ffc head, int8 queues: quantize the probes too and run the streamed
    # dots int8xint8->int32 (pool.queue_int8_compute) — validates the
    # approximation end-task before it's benched as a default
    ap.add_argument("--int8_compute", action="store_true")
    ap.add_argument("--tag", default="",
                    help="suffix for the results row (e.g. bf16mom)")
    # multi-seed support (round-4 verdict item 5): the seed drives BOTH the
    # init PRNGKey and the data order (cfg.data.seed). Seed 0 reproduces the
    # round-4 single-seed rows; non-zero seeds get an `_sN` row suffix so
    # tools/aggregate_matrix_seeds.py can group repeats into mean±range.
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from cross_stack_eval import build_pair_bin

    from vlsfr_tpu.config import Config
    from vlsfr_tpu.data.synthetic import generate_synthetic_store
    from vlsfr_tpu.train.trainer import Trainer

    if not os.path.exists(args.store):
        print(f"generating {args.ids}x{args.images_per_id} hard-synthetic "
              f"store at {args.store} ...", flush=True)
        t0 = time.time()
        generate_synthetic_store(args.store, num_ids=args.ids,
                                 images_per_id=args.images_per_id,
                                 image_size=112, hard=True,
                                 coef_jitter=args.coef_jitter)
        print(f"store generated in {time.time()-t0:.0f}s", flush=True)

    holdout = max(2000, args.ids * args.images_per_id // 20)
    bin_path = os.path.join(args.store, "holdout_foreign.bin")

    results = {}
    for head in args.heads:
        cfg = Config()
        cfg.model.net_type = args.net
        cfg.model.feat_dim = 128 if args.net == "mobile" else 512
        cfg.data.sources = [args.store]
        cfg.data.batch_size = args.batch
        cfg.data.num_workers = 6
        cfg.optim.lr = args.lr
        cfg.optim.epochs = args.epochs
        cfg.optim.milestones = [max(args.epochs - 1, 1)]
        cfg.optim.gammas = [0.1]
        cfg.pool.head = head
        cfg.pool.queue_size = args.queue
        cfg.pool.num_classes = args.ids
        cfg.data.seed = args.seed
        if head == "full_softmax":
            cfg.pool.use_fused = args.use_fused
            cfg.pool.classifier_dtype = args.cls_dtype
            cfg.pool.classifier_mom_dtype = args.mom_dtype
        else:
            cfg.pool.use_fused = args.use_fused
            cfg.pool.queue_dtype = args.queue_dtype
            cfg.pool.queue_int8_compute = args.int8_compute
        seed_sfx = f"_s{args.seed}" if args.seed else ""
        cfg.train.saved_dir = (
            f"/tmp/casia_study_{head}_{args.tag or 'base'}"
            f"{seed_sfx}_{args.epochs}ep")
        cfg.train.print_freq = 200
        cfg.train.save_freq = 10**9  # no mid-run checkpoints needed
        cfg.train.holdout_records = holdout
        cfg.train.eval_freq = 0
        trainer = Trainer(cfg)
        if not os.path.exists(bin_path):
            # foreign-format bin over the holdout tail (indices >= limit)
            build_pair_bin(args.store, bin_path, 1000, seed=7,
                           start=trainer.record_limit)
        print(f"=== training head={head} ===", flush=True)
        t0 = time.time()
        summary = trainer.train()
        train_s = time.time() - t0
        res = full_eval(trainer, bin_path=bin_path)
        res["final_loss"] = round(float(summary.get("loss", float("nan"))), 3)
        res["train_acc"] = round(float(summary.get("train_acc", -1.0)), 4)
        res["train_seconds"] = round(train_s, 0)
        trainer.close()
        key = head + (f"_{args.tag}" if args.tag else "") + seed_sfx
        results[key] = res
        print(key, json.dumps(res), flush=True)

    if args.out:
        # Emit the section header + preamble + table header only once per
        # (out-file, run-config) — subsequent appends add bare table rows so
        # the matrix reads as ONE comparable table (round-4 advisor finding:
        # per-row H1 duplication made control-vs-feature deltas unreadable).
        header_line = (
            f"<!-- matrix: ids={args.ids} imgs={args.images_per_id} "
            f"jitter={args.coef_jitter} net={args.net} batch={args.batch} "
            f"epochs={args.epochs} -->")
        have_header = False
        if os.path.exists(args.out):
            with open(args.out) as f:
                have_header = header_line in f.read()
        lines = [] if have_header else [
            header_line,
            "# CASIA-scale accuracy study (hard-synthetic, real TPU training)",
            "",
            f"Store: {args.ids} identities x {args.images_per_id} images, 112x112",
            f"hard-synthetic (data/synthetic.py shared-manifold, "
            f"coef_jitter={args.coef_jitter}), net={args.net},",
            f"batch={args.batch}, epochs={args.epochs}, holdout={holdout} records;",
            "the `.bin` columns evaluate a foreign-format verification file",
            "(insightface lfw2pack packing, NOT this repo's writer;",
            "tools/cross_stack_eval.py).",
            "",
            "| head | verif acc | TAR@FAR1e-2 | TAR@FAR1e-3 | rank-1 | rank-5 | bin acc | train_acc | loss |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for head, r in results.items():
            lines.append(
                f"| {head} | {r['verification_acc']}±{r['verification_std']} "
                f"| {r['tar_at_far_1e2']} | {r['tar_at_far_1e3']} "
                f"| {r.get('ident_rank1', '-')} | {r.get('ident_rank5', '-')} "
                f"| {r.get('bin_verification_acc', r.get('bin_acc', '-'))} "
                f"| {r['train_acc']} | {r['final_loss']} |")
        lines.append("")
        lines.append(f"Raw: `{json.dumps(results)}`")
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")
        print(f"appended results to {args.out}")


if __name__ == "__main__":
    main()
