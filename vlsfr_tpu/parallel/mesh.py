"""Device mesh + sharding layout for the framework.

The reference is strictly single-GPU (SURVEY.md §2.3-2.4: no DDP, no
torch.distributed, the ``--sync_bn`` flag is dead). The rebuild is SPMD from
the ground up over a 2-axis mesh:

    ("data", "model")

* ``data``  — batch (data-parallel) axis. Images, labels and per-step DCP
  index tensors are sharded here; gradient/batch-stat reductions ride ICI
  automatically under GSPMD (writing the math globally and annotating
  shardings makes XLA insert the psums — this also makes BatchNorm
  *synchronized* for free, since batch stats are means over the global
  array).
* ``model`` — class axis. The DCP queue ([2, Q, D] sharded on Q) and the
  full-softmax / partial-FC classifier ([C, D] sharded on C) split their
  rows across devices; cosine-logit matmuls produce class-sharded logits
  and the CE's logsumexp reduction becomes an ICI all-reduce.

Single chip is the degenerate 1×1 mesh — the same jitted step runs
unchanged from 1 chip to a full slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build the ("data", "model") mesh. data=-1 → use all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        model = 1
    if data <= 0:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def queue_sharding(mesh: Mesh) -> NamedSharding:
    """DCP queue [2, Q, D]: class axis sharded over the model axis."""
    return NamedSharding(mesh, P(None, "model", None))


def queue_scales_sharding(mesh: Mesh) -> NamedSharding:
    """Int8-queue per-row scales [2, Q] (ops/qqueue.py): sharded on the
    model axis alongside the queue rows."""
    return NamedSharding(mesh, P(None, "model"))


def classifier_sharding(mesh: Mesh) -> NamedSharding:
    """Dense classifier [C, D]: class axis sharded over the model axis."""
    return NamedSharding(mesh, P("model", None))


def class_vector_sharding(mesh: Mesh) -> NamedSharding:
    """Per-class 1-D state [C] (e.g. sparse-row last-visit steps): sharded
    over the model axis alongside the classifier rows."""
    return NamedSharding(mesh, P("model"))


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with the batch axis sharded on data."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
