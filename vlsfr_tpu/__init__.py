"""vlsfr_tpu — TPU-native Very-Large-Scale Face Recognition framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``sqnkkang/Very-Large-Scale-Face-Recognition`` (the FFC training approach,
arXiv 2105.10375): fixed-size Dynamic Class Pool (DCP) classifier with LRU
identity admission, margin-softmax losses (ArcFace / CosFace-AM / SVFC),
probe/gallery twin networks with EMA momentum, plus what the reference lacks:
data-parallel + partial-FC sharded training over a TPU mesh, a fused Pallas
margin-softmax kernel, full checkpoint/resume, and an eval pipeline.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

    cli/train.py      — entry point (reference: main.py:146-170)
    train/            — train loop, TrainState, checkpointing (main.py:23-143)
    core/             — FFC functional step, DCP host cache (ffc.py, lru.py)
    models/           — backbones emitting L2-normalized embeddings (model/)
    ops/              — margin losses + Pallas kernels (ffc.py:60-138)
    optim/            — optax optimizers + warmup schedulers (optim/)
    data/             — record store, samplers, prefetch (util/lmdb_loader.py)
    parallel/         — mesh, shardings, partial-FC collectives (new)
    eval/             — embedding extraction + verification (new; ref has none)
"""

__version__ = "0.1.0"
