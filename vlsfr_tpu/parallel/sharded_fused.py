"""Model-sharded fused-SGD streaming softmax head (pod-scale, exact loss).

Single-chip round 3 measured the fused-SGD classifier update at +11.7%
over dense streaming + optax at C=1M (docs/PERF.md): the [C, D] gradient
is consumed in-register tile by tile and the classifier/momentum buffers
are updated in place (``input_output_aliases``). This module lifts that
onto the mesh for class-sharded classifiers — the reference's 10M-identity
regime (/root/reference/ffc.py:29 scaled; BASELINE configs 4-5) where one
chip cannot hold [C, D] at all.

The key observation that makes the fused update compose with ANY
(data, model) mesh without materializing d_w:

* the classifier is sharded over ``model`` only — every shard in a model
  row group holds the same [C/m, D] block, replicated over ``data``;
* d_w for a block is a function of (ALL global-batch embeddings, global
  logz/topk, the block). All-gathering the embeddings over ``data`` —
  a [B, D] transfer, tiny next to the [C/m, D] stream — lets every shard
  compute its block's FULL gradient locally, so the per-block SGD update
  runs inside the streaming backward exactly like the single-chip kernel:
  no d_w store, no data-axis psum of a [C/m, D] tensor, and the update is
  bit-identical (hence consistent) across the data-replicas of each block.
  This is the same replicated-head-compute trade the pure-DP fused path
  makes (train/softmax_head.py), applied per model shard.

Composition per shard (shard_map body):
  1. all_gather emb/labels over "data" → global batch.
  2. localize labels; gt via model-psum (owner shard contributes).
  3. streaming forward partials over the local block
     (ops/margin_pallas.pallas_margin_partial_fwd; scan fallback off-TPU)
     → pmax/psum logsumexp merge, all_gather+top_k for hard-neg — the
     identical merge as parallel/sharded_margin.py.
  4. fused backward+update over the local block with the GLOBAL logz and
     ``pos_rows`` = global positive mask: rows whose target lives on
     another shard keep their softmax column gradients here while the
     target tail runs only on the owner (ops/margin_pallas.py
     pallas_margin_ce_bwd_fused_sgd).
  5. d_emb: psum over "model", slice back to the local data rows.

Trajectory == dense streaming + optax SGD, bit-exact in f32 against the
single-chip fused oracle (tests/test_fused_update.py, 8-device CPU mesh,
meshes (1,8)/(2,4)/(4,2)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vlsfr_tpu.ops.margin_pallas import (
    _normalize_rows,
    _phi_prime,
    _phi_target,
    apply_sgd_dense,
    pallas_margin_ce_bwd_fused_sgd,
    pallas_margin_partial_fwd,
)
from vlsfr_tpu.parallel.sharded_margin import _local_partials, dense_local_bwd_scan

AXIS = "model"


def make_sharded_fused_sgd_head(mesh, *, momentum, nesterov, weight_decay,
                                loss_type="Arc", margin=0.5, scale=32.0,
                                mask_svfc=1.2, normalize_w=True, hard_neg=1,
                                tile=512, data_axis="data",
                                use_pallas="auto", interpret=False):
    """Returns head(emb, w, mom, labels, lr) ->
    (ce, neg, topk, gt, d_emb, new_w, new_mom).

    emb [B_local, D] P(data, None); w [C, D] w-dtype and mom [C, D] f32,
    both P(model, None); labels [B_local] global ids P(data); lr a traced
    scalar. ce/neg/topk/gt come back for the GLOBAL batch, replicated;
    d_emb is the local batch rows P(data, None); new_w/new_mom are the
    updated classifier state P(model, None). loss = mean(ce) over the
    global batch — its cotangents are analytic inside (the head runs
    outside jax.grad, like every fused/sparse head in this repo).
    """
    kw = dict(loss_type=loss_type, margin=margin, mask_svfc=mask_svfc,
              scale=scale, k=hard_neg, normalize_w=normalize_w, tile=tile)
    sgd_kw = dict(momentum=momentum, nesterov=nesterov,
                  weight_decay=weight_decay)
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"

    def shard_head(emb_l, w_l, mom_l, labels_l, lr):
        b_l = emb_l.shape[0]
        c_local = w_l.shape[0]
        emb = jax.lax.all_gather(emb_l, data_axis, axis=0, tiled=True)
        labels = jax.lax.all_gather(labels_l, data_axis, axis=0, tiled=True)
        emb32 = emb.astype(jnp.float32)

        offset = jax.lax.axis_index(AXIS) * c_local
        ll_raw = labels - offset
        owned = (ll_raw >= 0) & (ll_raw < c_local)
        ll = jnp.where(owned, ll_raw, -1)
        safe = jnp.maximum(ll, 0)
        wl32 = w_l[safe].astype(jnp.float32)
        wln = _normalize_rows(wl32) if normalize_w else wl32
        gt_part = jnp.sum(emb32 * wln, axis=-1)
        gt = jax.lax.psum(jnp.where(owned, gt_part, 0.0), AXIS)

        if use_pallas:
            m_l, s_l, topk_l = pallas_margin_partial_fwd(
                emb32, w_l, ll, gt, interpret=interpret, **kw)
        else:
            m_l, s_l, topk_l = _local_partials(emb32, w_l, ll, gt, **kw)
        gmax = jax.lax.pmax(m_l, AXIS)
        s = jax.lax.psum(s_l * jnp.exp(m_l - gmax), AXIS)
        logz = gmax + jnp.log(s)
        topk_all = jax.lax.all_gather(topk_l, AXIS)  # [m, B, k]
        topk_all = jnp.moveaxis(topk_all, 0, 1).reshape(emb.shape[0], -1)
        topk, _ = jax.lax.top_k(topk_all, hard_neg)

        pos = labels >= 0
        phi = _phi_target(gt, loss_type, margin, mask_svfc)
        ce = jnp.where(pos, logz - scale * phi, 0.0)
        neg = jnp.where(pos, 0.0, jnp.mean(jnp.maximum(topk, 0.0), axis=-1))
        # loss = mean(ce) over the global batch: analytic cotangents
        d_ce = jnp.where(pos, 1.0 / emb.shape[0], 0.0)
        d_neg = jnp.zeros((emb.shape[0],), jnp.float32)

        if use_pallas:
            d_emb_p, new_w, new_mom = pallas_margin_ce_bwd_fused_sgd(
                emb32, w_l, mom_l, ll, gt, logz, topk, d_ce, d_neg, lr,
                pos_rows=pos, interpret=interpret, **sgd_kw, **kw)
        else:
            d_emb_p, d_w, d_gt_raw = dense_local_bwd_scan(
                emb32, w_l, ll, pos, gt, logz, topk[:, -1], d_ce, d_neg,
                grad_w=True, **kw)
            # owner tail (d_gt_raw is nonzero only on the owner shard — no
            # collective needed; the pallas branch derives it analytically)
            d_gt = d_gt_raw * _phi_prime(gt, loss_type, margin)
            own1 = (owned & pos).astype(jnp.float32)[:, None]
            d_emb_p = d_emb_p + d_gt[:, None] * wln * own1
            d_wln = d_gt[:, None] * emb32 * own1
            if normalize_w:
                n2 = jnp.maximum(jnp.sum(wl32 * wl32, -1, keepdims=True), 1e-24)
                d_wl = jax.lax.rsqrt(n2) * (
                    d_wln - wln * jnp.sum(d_wln * wln, -1, keepdims=True))
            else:
                d_wl = d_wln
            d_w = d_w.at[safe].add(jnp.where(own1 > 0, d_wl, 0.0))
            new_w, new_mom = apply_sgd_dense(w_l, mom_l, d_w, lr, **sgd_kw)

        d_emb = jax.lax.psum(d_emb_p, AXIS)
        i = jax.lax.axis_index(data_axis)
        d_emb_l = jax.lax.dynamic_slice_in_dim(d_emb, i * b_l, b_l, axis=0)
        return (ce, neg, topk, gt, d_emb_l.astype(emb_l.dtype),
                new_w, new_mom)

    def head(emb, w, mom, labels, lr):
        return jax.shard_map(
            shard_head, mesh=mesh,
            in_specs=(P(data_axis, None), P(AXIS, None), P(AXIS, None),
                      P(data_axis), P()),
            out_specs=(P(), P(), P(), P(), P(data_axis, None),
                       P(AXIS, None), P(AXIS, None)),
            check_vma=False,
        )(emb, w, mom, labels, jnp.asarray(lr, jnp.float32))

    return head
