"""Sharded margin-softmax classifier (partial-FC layout).

The reference never shards its classifier — the whole point of its FFC
algorithm is to keep the classifier O(queue_size) on one GPU. The rebuild
adds the *spatial* dimension the paper family (Partial FC, arXiv 2010.05222)
uses at 10M+ identities: the class-weight matrix [C, D] is sharded row-wise
over the mesh's ``model`` axis.

Everything here is plain global-view math with sharding constraints — under
jit+GSPMD, XLA turns:

* ``emb @ W.T``              into per-shard matmuls producing class-sharded
                             logits (no weight gather);
* ``logsumexp(logits, -1)``  into a local reduce + ICI all-reduce;
* the weight gradient        into a reduce-scatter back onto the shards.

The same functions run unsharded on one chip (constraints are no-ops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vlsfr_tpu.ops.margin import margin_logits

NEG_INF = -1e30


def sample_classes(
    labels: jnp.ndarray, num_classes: int, num_sampled: int, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build the partial-FC sampled class set (arXiv 2010.05222 semantics):
    unique positives plus random negatives, with every duplicate masked so
    each class contributes at most ONE column to the CE denominator.

    Static shapes throughout (S = ``num_sampled``). Returns:

    * ``sampled`` [S] int32 — class ids; positions ``0..B-1`` are the batch
      labels, the tail is sorted random draws. Invalid positions keep a real
      id (safe to gather) but must be masked/dropped by the caller.
    * ``local_labels`` [B] int32 — each row's target position in ``sampled``
      (first occurrence, so rows sharing an identity share one column).
    * ``valid`` [S] bool — False for duplicate batch labels, random draws
      equal to an earlier draw, and random draws colliding with any batch
      label (which would put an un-margined copy of a target column in the
      denominator).

    The single shared implementation for both the library loss
    (:func:`sampled_margin_softmax_loss`) and the trainer path
    (train/softmax_head.py) — they must not drift.
    """
    b = labels.shape[0]
    labels = labels.astype(jnp.int32)
    # first-occurrence remap: rows with a repeated identity all point at the
    # first copy's column; later copies are masked out of the denominator
    eq = labels[:, None] == labels[None, :]
    first = jnp.argmax(eq, axis=1).astype(jnp.int32)
    pos_valid = first == jnp.arange(b, dtype=jnp.int32)
    n_rand = num_sampled - b
    if n_rand > 0:
        rand = jnp.sort(jax.random.randint(key, (n_rand,), 0, num_classes)).astype(jnp.int32)
        # sorted ⇒ same-value draws are adjacent: neighbor test dedups
        rand_valid = jnp.concatenate(
            [jnp.ones((1,), bool), rand[1:] != rand[:-1]]
        )
        rand_valid &= ~jnp.any(rand[:, None] == labels[None, :], axis=1)
    else:
        rand = jnp.zeros((0,), jnp.int32)
        rand_valid = jnp.zeros((0,), bool)
    sampled = jnp.concatenate([labels, rand])
    valid = jnp.concatenate([pos_valid, rand_valid])
    return sampled, first, valid


def l2_normalize_rows(w: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(w.astype(jnp.float32)), axis=-1, keepdims=True))
    return w / jnp.maximum(n, eps)


def cosine_logits(
    emb: jnp.ndarray, weights: jnp.ndarray, mesh=None
) -> jnp.ndarray:
    """[B, D] normalized embeddings × [C, D] class weights → [B, C] cosines.

    ``weights`` rows are normalized here (ArcFace convention); with a mesh,
    logits are constrained to (data, model) sharding so the matmul stays
    local to each class shard.
    """
    w = l2_normalize_rows(weights)
    logits = jnp.einsum("bd,cd->bc", emb.astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)
    if mesh is not None:
        logits = jax.lax.with_sharding_constraint(
            logits, jax.sharding.NamedSharding(mesh, P("data", "model"))
        )
    return logits


def margin_softmax_loss(
    emb: jnp.ndarray,
    weights: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    loss_type: str = "Arc",
    margin: float = 0.5,
    scale: float = 32.0,
    mask_svfc: float = 1.2,
    mesh=None,
    streaming: bool = False,
    col_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Full-softmax ArcFace/AM/SV loss over ``num_classes = weights.shape[0]``.

    Labels are global class ids (always valid — no pool, no outliers).
    Returns (mean CE, metrics). With ``streaming``, the fused kernel streams
    the class axis ([B, C] logits never materialize) — the path for C ≥ 1M;
    train_acc is then derived from the kernel's running top-1 (exact up to
    cosine ties). ``col_mask`` [C] excludes columns from the denominator
    (partial-FC duplicate masking); dense path only.
    """
    if streaming:
        assert col_mask is None, "col_mask is a dense/sampled-path feature"
        from vlsfr_tpu.ops.margin_pallas import compute_gt, fused_margin_softmax

        emb32 = emb.astype(jnp.float32)
        ce, _neg, top1 = fused_margin_softmax(
            emb32, weights, labels, loss_type, margin, scale,
            1, mask_svfc, True, 512, "auto",
        )
        loss = jnp.mean(ce)
        # top-1 correct ⇔ the target's cosine matches the running max
        # (ties count as correct, like the dense argmax==label convention)
        gt = compute_gt(emb32, weights, labels, True)
        acc = jnp.mean((gt >= top1[:, 0]).astype(jnp.float32))
        return loss, {"ce": loss, "train_acc": acc}
    logits = cosine_logits(emb, weights, mesh=mesh)
    if col_mask is not None:
        logits = jnp.where(col_mask[None, :], logits, NEG_INF)
    modified = margin_logits(logits, labels, loss_type=loss_type, margin=margin,
                             mask_svfc=mask_svfc) * scale
    logz = jax.nn.logsumexp(modified, axis=-1)
    target = jnp.take_along_axis(modified, labels[:, None], axis=-1)[:, 0]
    ce = logz - target
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return jnp.mean(ce), {"ce": jnp.mean(ce), "train_acc": acc}


def sampled_margin_softmax_loss(
    emb: jnp.ndarray,
    weights: jnp.ndarray,
    labels: jnp.ndarray,
    rng: jax.Array,
    num_sampled: int,
    *,
    loss_type: str = "Arc",
    margin: float = 0.5,
    scale: float = 32.0,
    mask_svfc: float = 1.2,
) -> tuple[jnp.ndarray, dict]:
    """Partial-FC class sampling (arXiv 2010.05222): the CE denominator uses
    the batch's positive classes plus a per-step random subset of negatives,
    so the classifier matmul/grad touch only ``num_sampled`` rows instead of
    ``num_classes`` (the paper shows ~0.1 sample rates preserve accuracy).

    The sampled set comes from :func:`sample_classes`: unique positives
    (duplicate batch identities share one first-occurrence column) plus
    collision-masked random negatives — every class contributes at most one
    column to the denominator, matching the paper's construction. Gradients
    reach the sampled weight rows via the gather's scatter-add transpose;
    untouched rows get exact zero grads, masked columns get exact zero grads.
    """
    c = weights.shape[0]
    b = emb.shape[0]
    assert num_sampled >= b, "num_sampled must cover the batch's positives"
    sampled, local_labels, valid = sample_classes(labels, c, num_sampled, rng)
    w_sub = weights[sampled]  # [S, D] gather; VJP scatter-adds into full W
    loss, metrics = margin_softmax_loss(
        emb, w_sub, local_labels, loss_type=loss_type, margin=margin, scale=scale,
        mask_svfc=mask_svfc, col_mask=valid,
    )
    return loss, dict(metrics, sampled_classes=jnp.int32(num_sampled))
