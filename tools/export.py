#!/usr/bin/env python
"""Export a trained backbone for serving.

Produces either (a) a standalone orbax checkpoint holding only the backbone
variables (loadable by vlsfr_tpu.eval.extract.Embedder), or (b) a serialized
StableHLO function via jax.export that runs without this codebase.

Usage:
    python tools/export.py --ckpt ./checkpoint --out ./export \
        --net_type ir50 [--format stablehlo] [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--net_type", default="r50")
    ap.add_argument("--feat_dim", type=int, default=512)
    ap.add_argument("--format", choices=["orbax", "stablehlo"], default="orbax")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--step", type=int, default=-1)
    ap.add_argument("--int8", action="store_true",
                    help="bake the int8 inference path (ops/quant.py) into "
                         "the exported function — +27%% serving throughput "
                         "on v5e for ir*/r* backbones (docs/PERF.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from vlsfr_tpu.models import create_net, native_image_size
    from vlsfr_tpu.train.pretrained import load_pretrained_backbone

    variables = load_pretrained_backbone(args.ckpt, args.net_type, args.feat_dim)
    size = native_image_size(args.net_type)
    os.makedirs(args.out, exist_ok=True)

    if args.format == "orbax":
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(os.path.join(args.out, "backbone")), variables)
        print(f"wrote orbax backbone → {args.out}/backbone")
    else:
        from jax import export as jexport

        model = create_net(args.net_type, feat_dim=args.feat_dim, dtype=jnp.bfloat16)

        if args.int8:
            from vlsfr_tpu.ops.quant import int8_conv_inference

            def forward(images):
                with int8_conv_inference():
                    return model.apply(variables, images, train=False)
        else:
            def forward(images):
                return model.apply(variables, images, train=False)

        exported = jexport.export(jax.jit(forward))(
            jax.ShapeDtypeStruct((args.batch, size, size, 3), jnp.float32)
        )
        blob = exported.serialize()
        path = os.path.join(args.out, f"{args.net_type}_embed.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"wrote serialized StableHLO ({len(blob)} bytes) → {path}")
        print("load with: jax.export.deserialize(open(path,'rb').read()).call(images)")


if __name__ == "__main__":
    main()
