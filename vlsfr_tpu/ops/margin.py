"""Margin-softmax losses with hard-negative outlier suppression.

Pure jittable re-implementations of the reference's ``FFC.add_margin``
(/root/reference/ffc.py:60-138). The reference splits the batch into
positive rows (``label != -1``: the label is a pool slot) and outlier rows
(``label == -1``: identity not in the Dynamic Class Pool), computes a
margin-modified cross-entropy over the positives, and suppresses the mean of
the top-``hard_neg`` clipped cosine similarities of the outliers.

TPU-first differences from the reference:

* No dynamic row-gathering: positives/outliers are handled with masks so
  shapes stay static under ``jit``.
* All loss math in float32 regardless of the bf16 activations feeding it
  (the reference casts to float for Arc/SV, ffc.py:97,118).
* The margin transforms are exposed separately (:func:`margin_logits`) so the
  fused Pallas kernel (ops/margin_pallas.py) and the sharded partial-FC path
  (parallel/partial_fc.py) can reuse them without the CE reduction.
"""

from __future__ import annotations


from functools import partial

import jax
import jax.numpy as jnp


def default_hard_neg(queue_size: int) -> int:
    """clamp(int(queue_size * 2e-4), 3, 10) — reference ffc.py:48."""
    return min(max(int(queue_size * 0.0002), 3), 10)


def _one_hot_rows(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot [B, Q] for labels already known to be valid slots."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def margin_logits(
    cos_theta: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    loss_type: str,
    margin: float,
    mask_svfc: float = 1.2,
) -> jnp.ndarray:
    """Apply the margin transform to the target column of each positive row.

    ``labels`` may contain -1 (outlier rows); those rows pass through
    unmodified (their CE contribution is masked out by the caller anyway).
    Returns unscaled modified cosines, float32.

    AM / CosFace  (ffc.py:73-83):  target ->  cosθ − m
    Arc / ArcFace (ffc.py:95-104): target ->  cos(θ + m) = gt·cos m − sinθ·sin m
    SV / SVFC     (ffc.py:116-127): hard columns (cosθ > gt − m) are re-scaled
        to ``t·cosθ + t − 1`` with t = mask_svfc; the target becomes
        ``gt − m`` when gt > m else gt.
    """
    cos_theta = cos_theta.astype(jnp.float32)
    q = cos_theta.shape[-1]
    valid = labels >= 0
    safe_labels = jnp.where(valid, labels, 0)
    onehot = _one_hot_rows(safe_labels, q)
    gt = jnp.sum(cos_theta * onehot, axis=-1, keepdims=True)  # [B, 1]

    if loss_type == "AM":
        target_val = gt - margin
        out = cos_theta * (1.0 - onehot) + target_val * onehot
    elif loss_type == "Arc":
        # clamp: d/dgt sqrt(1-gt²) → ∞ at |gt|=1, and a well-trained model
        # reaches gt == 1.0 exactly (NaN grads; latent in the reference too,
        # ffc.py:101 — hit here because bf16 cosines round to 1)
        gt_c = jnp.clip(gt, -1.0 + 1e-6, 1.0 - 1e-6)
        sin_theta = jnp.sqrt(1.0 - gt_c * gt_c)
        m = jnp.asarray(margin, dtype=jnp.float32)
        target_val = gt_c * jnp.cos(m) - sin_theta * jnp.sin(m)
        out = cos_theta * (1.0 - onehot) + target_val * onehot
    elif loss_type == "SV":
        hard = cos_theta > (gt - margin)  # [B, Q], includes target col
        boosted = jnp.where(hard, mask_svfc * cos_theta + mask_svfc - 1.0, cos_theta)
        final_gt = jnp.where(gt > margin, gt - margin, gt)  # [B, 1]
        # target column is overwritten last, exactly like the reference's
        # scatter_ after the masked assignment (ffc.py:125-126)
        out = boosted * (1.0 - onehot) + final_gt * onehot
    else:
        raise ValueError(f"loss_type must be AM | Arc | SV, got {loss_type!r}")

    # outlier rows keep their raw cosines
    return jnp.where(valid[:, None], out, cos_theta)


@partial(jax.jit, static_argnames=("loss_type", "hard_neg"))
def add_margin(
    cos_theta: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    loss_type: str = "Arc",
    margin: float = 0.5,
    scale: float = 32.0,
    hard_neg: int = 3,
    mask_svfc: float = 1.2,
) -> jnp.ndarray:
    """Combined positive CE + outlier hard-negative loss (ffc.py:60-138).

    cos_theta: [B, Q] cosine similarities (any float dtype).
    labels:    [B] int pool-slot labels, -1 marking outlier rows.
    Returns a scalar float32 loss: mean CE over positive rows (margin-modified,
    scaled) + mean of the top-``hard_neg`` non-negative cosines over outlier
    rows. Either term is 0 when its row set is empty.
    """
    cos_theta = cos_theta.astype(jnp.float32)
    pos = (labels >= 0).astype(jnp.float32)  # [B]
    n_pos = jnp.sum(pos)
    n_out = jnp.sum(1.0 - pos)

    # --- positive rows: margin + scaled cross entropy ---
    logits = scale * margin_logits(
        cos_theta, labels, loss_type=loss_type, margin=margin, mask_svfc=mask_svfc
    )
    safe_labels = jnp.where(labels >= 0, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)  # [B]
    target_logit = jnp.take_along_axis(logits, safe_labels[:, None], axis=-1)[:, 0]
    ce = logz - target_logit  # [B]
    cls_loss = jnp.where(n_pos > 0, jnp.sum(ce * pos) / jnp.maximum(n_pos, 1.0), 0.0)

    # --- outlier rows: mean of top-k clipped raw cosines (ffc.py:86-92) ---
    k = min(hard_neg, cos_theta.shape[-1])
    topk, _ = jax.lax.top_k(cos_theta, k)  # [B, k]
    clipped = jnp.maximum(topk, 0.0)
    per_row = jnp.sum(clipped, axis=-1) / k  # [B]
    neg_loss = jnp.where(
        n_out > 0, jnp.sum(per_row * (1.0 - pos)) / jnp.maximum(n_out, 1.0), 0.0
    )
    return cls_loss + neg_loss


def cross_entropy_label_smooth(
    logits: jnp.ndarray, labels: jnp.ndarray, epsilon: float = 0.1
) -> jnp.ndarray:
    """Label-smoothed cross entropy (reference optim/optimizer.py:130-141 —
    defined there but never wired; provided here as a usable op).

    loss = mean_over_batch( -Σ_c q_c · log p_c ) with
    q = (1−ε)·onehot + ε/C, matching the reference's ``.mean(0).sum()``.
    """
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    q = (1.0 - epsilon) * onehot + epsilon / c
    return jnp.mean(jnp.sum(-q * logp, axis=-1))
