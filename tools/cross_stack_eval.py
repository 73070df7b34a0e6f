"""Cross-stack verification: a .bin this repo's writer did NOT produce,
evaluated by two independent pipelines (round-2 verdict item 4).

Three independence properties, each closing a "self-round-trip" loophole:

1. the verification ``.bin`` is packed HERE with the insightface
   ``lfw2pack`` conventions (pickle protocol 2, raw encoded bytes,
   pair-interleaved images, one bool per pair) — NOT with
   eval/verification.save_insightface_bin;
2. the images are embedded by the REFERENCE'S OWN torch MobileFaceNet
   (/root/reference/model/mobilefacenet_def.py, imported at runtime) with
   the reference's preprocessing re-implemented from its loader
   (util/lmdb_loader.py:113-127: cv2.imdecode → (x−127.5)/128 → CHW);
3. the same images + the same weights (ported via
   models/torch_import.convert_torch_state_dict) run through THIS repo's
   eval path (load_insightface_bin → Embedder → kfold protocol).

Agreement of the two stacks' verification accuracy / TAR@FAR on the same
foreign-format file is the claim tests/test_cross_stack_bin.py pins down.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import pickle
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def pack_bin_insightface_style(path, payloads, issame):
    """insightface lfw2pack-style packing: pickle protocol 2 of
    (list-of-encoded-bytes, list-of-bool), images pair-interleaved.
    Deliberately independent of eval/verification.save_insightface_bin."""
    assert len(payloads) == 2 * len(issame)
    with open(path, "wb") as f:
        pickle.dump((payloads, [bool(v) for v in issame]), f, protocol=2)


def build_pair_bin(store_dir, out_path, n_pairs, seed=0, start=0):
    """Sample same/different pairs from a FaceRecordWriter store and pack
    them with the foreign-style packer. Returns the issame array.
    ``start`` restricts sampling to record indices >= start (e.g. the
    holdout tail — tools/casia_scale_study.py)."""
    from vlsfr_tpu.data.records import FaceRecordReader

    rng = np.random.default_rng(seed)
    reader = FaceRecordReader(store_dir)
    labels = np.asarray(reader.labels)
    by_id = {}
    for i in range(start, len(labels)):
        by_id.setdefault(int(labels[i]), []).append(i)
    multi = [l for l, idxs in by_id.items() if len(idxs) >= 2]
    ids = list(by_id)
    payloads, issame = [], []
    for k in range(n_pairs):
        if k % 2 == 0:  # same pair
            l = multi[rng.integers(len(multi))]
            i, j = rng.choice(by_id[l], 2, replace=False)
            issame.append(True)
        else:
            la, lb = rng.choice(len(ids), 2, replace=False)
            i = by_id[ids[la]][rng.integers(len(by_id[ids[la]]))]
            j = by_id[ids[lb]][rng.integers(len(by_id[ids[lb]]))]
            issame.append(False)
        payloads += [reader.payload(int(i)), reader.payload(int(j))]
    pack_bin_insightface_style(out_path, payloads, np.asarray(issame))
    reader.close()
    return np.asarray(issame, np.int32)


def torch_reference_eval(bin_path, image_size, tm=None, batch=32):
    """The reference stack's side: decode + normalize per
    /root/reference/util/lmdb_loader.py:113-127, embed with the
    reference's torch MobileFaceNet, run the same kfold protocol."""
    import cv2
    import torch

    from vlsfr_tpu.eval.verification import (
        cosine_scores,
        kfold_verification_accuracy,
        tar_at_far,
    )

    with open(bin_path, "rb") as f:
        bins, issame = pickle.load(f, encoding="bytes")
    imgs = []
    for b in bins:
        img = cv2.imdecode(np.frombuffer(bytes(b), np.uint8), cv2.IMREAD_COLOR)
        if img.shape[0] != image_size:
            img = cv2.resize(img, (image_size, image_size))
        img = (img.astype(np.float32) - 127.5) * 0.0078125
        imgs.append(img.transpose(2, 0, 1))  # CHW, reference contract
    x = torch.from_numpy(np.stack(imgs))
    if tm is None:
        tm = make_reference_mobile(image_size)
    embs = []
    with torch.no_grad():
        for i in range(0, len(x), batch):
            embs.append(tm(x[i:i + batch]).numpy())
    emb = np.concatenate(embs)
    scores = cosine_scores(emb[0::2], emb[1::2])
    labels = np.asarray(issame, np.int32)
    acc, std = kfold_verification_accuracy(scores, labels)
    return {"acc": acc, "std": std, "tar_far1e2": tar_at_far(scores, labels, 1e-2)}


def make_reference_mobile(image_size, seed=0):
    """Instantiate the reference's torch MobileFaceNet (runtime import of
    /root/reference/model/mobilefacenet_def.py) with calibrated BN."""
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_mobilefacenet", "/root/reference/model/mobilefacenet_def.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(seed)
    tm = mod.MobileFaceNet(feat_dim=128, fp16=False)
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.momentum = 1.0
    tm.train()
    with torch.no_grad():
        tm(torch.randn(4, 3, image_size, image_size))
    tm.eval()
    return tm


def our_stack_eval(bin_path, image_size, tm, batch=32):
    """This repo's side: load_insightface_bin + flax mobile net carrying
    the torch model's ported weights + the same protocol."""
    import jax.numpy as jnp

    from vlsfr_tpu.eval.verification import (
        cosine_scores,
        kfold_verification_accuracy,
        load_insightface_bin,
        tar_at_far,
    )
    from vlsfr_tpu.models import create_net
    from vlsfr_tpu.models.torch_import import convert_torch_state_dict

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_torch_state_dict(sd, "mobile", 128)
    model = create_net("mobile", feat_dim=128)
    imgs, labels = load_insightface_bin(bin_path, image_size)
    embs = []
    for i in range(0, len(imgs), batch):
        embs.append(np.asarray(model.apply(
            variables, jnp.asarray(imgs[i:i + batch]), train=False)))
    emb = np.concatenate(embs)
    scores = cosine_scores(emb[0::2], emb[1::2])
    acc, std = kfold_verification_accuracy(scores, labels)
    return {"acc": acc, "std": std, "tar_far1e2": tar_at_far(scores, labels, 1e-2)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ids", type=int, default=200)
    ap.add_argument("--images_per_id", type=int, default=4)
    ap.add_argument("--pairs", type=int, default=300)
    ap.add_argument("--image_size", type=int, default=112)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from vlsfr_tpu.data.synthetic import generate_synthetic_store

    tmp = args.out or tempfile.mkdtemp(prefix="xstack_")
    os.makedirs(tmp, exist_ok=True)
    store = os.path.join(tmp, "store")
    if not os.path.exists(store):
        generate_synthetic_store(store, num_ids=args.ids,
                                 images_per_id=args.images_per_id,
                                 image_size=args.image_size, hard=True)
    bin_path = os.path.join(tmp, "pairs.bin")
    build_pair_bin(store, bin_path, args.pairs)
    tm = make_reference_mobile(args.image_size)
    ref = torch_reference_eval(bin_path, args.image_size, tm)
    ours = our_stack_eval(bin_path, args.image_size, tm)
    print(f"reference torch stack: acc={ref['acc']:.4f}±{ref['std']:.4f} "
          f"tar@far1e-2={ref['tar_far1e2']:.4f}")
    print(f"vlsfr_tpu stack:       acc={ours['acc']:.4f}±{ours['std']:.4f} "
          f"tar@far1e-2={ours['tar_far1e2']:.4f}")
    agree = abs(ref["acc"] - ours["acc"]) < 0.01
    print("AGREE" if agree else "DISAGREE")
    return 0 if agree else 1


if __name__ == "__main__":
    sys.exit(main())
