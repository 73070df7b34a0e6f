#!/usr/bin/env python
"""vlsfr_tpu training entry point.

CLI surface mirrors the reference (/root/reference/main.py:146-170) — same
flag names and defaults — plus ``--config`` (full JSON config),
``--set section.key=value`` overrides, and mesh/data knobs the reference
lacks. The reference hardcodes its data paths (main.py:168-169); here
``--sources`` takes record-store directories (see tools/make_dataset.py).

Examples:
    # reference-equivalent run
    python train.py --net_type r50 --queue_size 1000 --batch_size 64 \
        --loss_type Arc --margin 0.5 --scale 32.0 --sources ./store

    # CPU-runnable synthetic smoke (BASELINE config 1 shape)
    JAX_PLATFORMS=cpu python train.py --net_type mobile --synthetic \
        --set data.synthetic_ids=100 --set optim.epochs=1

    # full-softmax head, classifier sharded over 4 chips
    python train.py --head full_softmax --set mesh.model=4 --sources ./store
"""

from __future__ import annotations

import argparse

from vlsfr_tpu.config import Config
from vlsfr_tpu.train.trainer import Trainer


def build_config(argv=None) -> Config:
    ap = argparse.ArgumentParser(description="very large scale face recognition (TPU)")
    # reference flags (main.py:151-163)
    ap.add_argument("--saved_dir", type=str, default="checkpoint")
    ap.add_argument("--net_type", type=str, default="r50")
    ap.add_argument("--queue_size", type=int, default=1000)
    ap.add_argument("--print_freq", type=int, default=1000)
    ap.add_argument("--pretrained_model_path", type=str, default="")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--alpha", type=float, default=0.99, help="gallery EMA momentum")
    ap.add_argument("--loss_type", type=str, default="Arc", choices=["Arc", "AM", "SV"])
    ap.add_argument("--margin", type=float, default=0.5)
    ap.add_argument("--scale", type=float, default=32.0)
    ap.add_argument("--neg_margin", type=float, default=0.25)
    ap.add_argument("--feat_dim", type=int, default=512)
    # rebuild additions
    ap.add_argument("--sources", nargs="*", default=[], help="record store dirs")
    ap.add_argument("--optim_config", type=str, default="",
                    help="reference-format typed-JSON optimizer config")
    ap.add_argument("--config", type=str, default="", help="full JSON config file")
    ap.add_argument("--head", type=str, default="ffc", choices=["ffc", "full_softmax"])
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="SECTION.KEY=VALUE")
    args = ap.parse_args(argv)

    cfg = Config.load(args.config) if args.config else Config()
    cfg.train.saved_dir = args.saved_dir
    cfg.model.net_type = args.net_type
    cfg.model.feat_dim = args.feat_dim
    cfg.pool.queue_size = args.queue_size
    cfg.pool.momentum = args.alpha
    cfg.pool.head = args.head
    cfg.train.print_freq = args.print_freq
    cfg.train.pretrained_model_path = args.pretrained_model_path
    cfg.data.batch_size = args.batch_size
    cfg.data.sources = list(args.sources)
    cfg.data.synthetic = args.synthetic
    cfg.loss.loss_type = args.loss_type
    cfg.loss.margin = args.margin
    cfg.loss.scale = args.scale
    cfg.loss.neg_margin = args.neg_margin
    if args.optim_config:
        cfg.apply_reference_optim_config(args.optim_config)
    cfg.apply_overrides(args.overrides)
    return cfg


def main(argv=None):
    cfg = build_config(argv)
    from vlsfr_tpu.parallel.distributed import initialize_multihost

    initialize_multihost()
    trainer = Trainer(cfg)
    trainer.install_signal_handlers()
    try:
        result = trainer.train()
        print("training done:", result)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
