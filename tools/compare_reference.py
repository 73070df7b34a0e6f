#!/usr/bin/env python
"""Executable parity proof against the PyTorch reference.

Builds each reference backbone from the reference's own model files (read
from --reference_dir, default /root/reference), converts its weights through
models/torch_import.py, runs the same inputs through both frameworks, and
reports embedding cosine agreement (BASELINE.md gate: ≥0.999).

Usage:
    python tools/compare_reference.py [--nets mobile ir50 r50] [--batch 4]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def load_ref_module(ref_dir, fname):
    spec = importlib.util.spec_from_file_location(
        f"ref_{fname[:-3]}", os.path.join(ref_dir, "model", fname)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference_dir", default="/root/reference")
    ap.add_argument("--nets", nargs="*", default=["mobile", "ir18", "ir50", "r18", "r50"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from vlsfr_tpu.models import create_net, native_image_size
    from vlsfr_tpu.models.torch_import import convert_torch_state_dict

    builders = {
        "mobile": lambda m: m.MobileFaceNet(feat_dim=128, fp16=False),
        "ir18": lambda m: m.iresnet18(feat_dim=512),
        "ir50": lambda m: m.iresnet50(feat_dim=512),
        "r18": lambda m: m.resnet18(feat_dim=512),
        "r50": lambda m: m.resnet50(feat_dim=512),
    }
    files = {"mobile": "mobilefacenet_def.py", "ir18": "resnet_arcface.py",
             "ir50": "resnet_arcface.py", "r18": "resnet_std.py", "r50": "resnet_std.py"}
    feat = {"mobile": 128}

    ok = True
    for net in args.nets:
        mod = load_ref_module(args.reference_dir, files[net])
        tm = builders[net](mod)
        size = native_image_size(net)
        # calibrate BN running stats (random-init nets explode in eval mode)
        for m in tm.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.momentum = 1.0
        tm.train()
        with torch.no_grad():
            tm(torch.randn(4, 3, size, size))
        tm.eval()

        fd = feat.get(net, 512)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = convert_torch_state_dict(sd, net, fd)
        rng = np.random.default_rng(args.seed)
        x = rng.standard_normal((args.batch, 3, size, size)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        model = create_net(net, feat_dim=fd)
        got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
        cos = np.sum(want * got, axis=-1) / (
            np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1)
        )
        status = "PASS" if cos.min() > 0.999 else "FAIL"
        ok &= status == "PASS"
        print(f"{net:7s} cosine min={cos.min():.6f} mean={cos.mean():.6f}  {status}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
