#!/usr/bin/env python
"""approx_max_k recall on a TRAINED gallery (round-3 verdict item 5).

The bench suite's 1:N search row and eval/index.py's default
``recall_target=0.95`` were validated on RANDOM unit rows, where
per-tile ``jax.lax.approx_max_k`` trivially keeps recall@10 = 1.0. A
trained gallery is the adversarial case: same-identity rows cluster, so
the true top-k are near-ties and approximate per-tile reduction is most
likely to drop members. This tool measures that directly:

  1. restore a trained checkpoint (a tools/casia_scale_study.py run),
  2. embed EVERY record of its store (~126k rows, ~12 same-id
     near-duplicates per identity = maximal score clustering),
  3. build two int8 FaceIndexes over the identical rows — approx
     (recall_target=0.95, the shipped default) and exact
     (recall_target=1.0 → lax.top_k) — via the public from_arrays,
  4. report recall@k = |approx_topk ∩ exact_topk| / k over held-out
     probes (row-id sets; ties beyond rank k make label-level recall
     look better, so row-id recall is the strict reading).

Usage:
    python tools/trained_gallery_recall.py --ckpt /tmp/casia_study_ffc_j20fused_2ep \
        --store /root/casia_syn_j20 --net_type mobile --feat_dim 128 [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="training saved_dir")
    ap.add_argument("--store", required=True)
    ap.add_argument("--net_type", default="mobile")
    ap.add_argument("--feat_dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--probes", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=65536)
    ap.add_argument("--image_size", type=int, default=0)
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from vlsfr_tpu.data.records import MultiSourceReader
    from vlsfr_tpu.eval.extract import Embedder
    from vlsfr_tpu.eval.index import FaceIndex
    from vlsfr_tpu.models import create_net, native_image_size

    size = args.image_size or native_image_size(args.net_type)
    model = create_net(args.net_type, feat_dim=args.feat_dim)
    mngr = ocp.CheckpointManager(os.path.abspath(args.ckpt))
    step = mngr.latest_step()
    assert step is not None, f"no checkpoints in {args.ckpt}"
    restored = mngr.restore(step)["state"]
    which = "probe" if "probe_params" in restored else "params"
    variables = ({"params": restored["probe_params"],
                  "batch_stats": restored["probe_stats"]}
                 if which == "probe" else
                 {"params": restored["params"]["backbone"],
                  "batch_stats": restored["batch_stats"]["backbone"]})

    reader = MultiSourceReader([args.store])
    emb = Embedder(model, variables, batch_size=256)
    t0 = time.time()
    embeddings = emb.from_reader(reader, size)
    labels = np.asarray(reader.labels)
    print(f"embedded {len(embeddings)} rows in {time.time()-t0:.0f}s",
          flush=True)

    # int8-quantize ONCE so both indexes hold bit-identical rows — the
    # study isolates the approx top-k, not quantization drift
    e = embeddings / np.maximum(
        np.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12)
    from vlsfr_tpu.eval.index import _quantize_rows
    q_rows, q_scales = _quantize_rows(e.astype(np.float32))

    rng = np.random.default_rng(7)
    probe_rows = rng.choice(len(e), size=min(args.probes, len(e)),
                            replace=False)
    queries = embeddings[probe_rows]

    out = {"checkpoint_step": int(step), "gallery_rows": int(len(e)),
           "ids": int(len(np.unique(labels))), "k": args.k,
           "probes": int(len(probe_rows))}
    results = {}
    for name, rt in (("approx_0.95", 0.95), ("exact", 1.0)):
        idx = FaceIndex.from_arrays(q_rows, labels, q_scales,
                                    tile=args.tile, recall_target=rt)
        t0 = time.time()
        vals, ridx, _ = idx.search(queries, args.k)
        results[name] = (ridx, vals)
        out[f"{name}_seconds"] = round(time.time() - t0, 1)

    ar, av = results["approx_0.95"]
    er, ev = results["exact"]
    hit = np.asarray([len(set(a) & set(b)) for a, b in zip(ar, er)])
    out["recall_at_k_rows"] = round(float(hit.mean() / args.k), 4)
    # label-level: does the approx top-1 still identify correctly?
    out["approx_top1_label_match"] = round(float(
        (labels[ar[:, 0]] == labels[er[:, 0]]).mean()), 4)
    # score floor: worst kth-score deficit (0 when sets agree)
    out["max_kth_score_deficit"] = round(float(
        np.max(ev[:, -1] - av[:, -1])), 5)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
