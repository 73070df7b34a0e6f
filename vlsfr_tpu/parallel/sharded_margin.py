"""Sharded + streaming margin-softmax: the 10M-identity path.

Composes the two big-class-axis strategies (SURVEY.md §7 hard part 3):

* **sharded** — class weights [C, D] split row-wise over the mesh ``model``
  axis (partial-FC layout, parallel/partial_fc.py);
* **streaming** — each shard streams its local [C/m, D] block through tiles
  with an online logsumexp (ops/margin_pallas.py), so neither the global
  nor the per-shard logits ever materialize.

Built with ``shard_map`` + an inner ``custom_vjp`` whose forward AND
backward issue the collectives explicitly. On TPU the per-shard streams run
the Pallas kernels (ops/margin_pallas.py pallas_margin_partial_fwd/bwd —
same kernels as the single-chip path, finalization deferred to the
collective merge); the ``lax.scan`` bodies below are the non-TPU fallback
(use_pallas="auto" selects by backend):

  forward:  local (m, s, topk, gt) partials
            → pmax/psum over "model" for the global logsumexp
            → psum for gt (only the owner shard contributes)
            → all_gather + top_k for the global outlier top-k
  backward: each shard re-streams its local tiles against the *global*
            logz/gt/kth, producing its local d_w shard directly (this IS the
            reduce-scatter of classifier grads — each shard only ever holds
            its own rows) and a partial d_emb that is psum'd over "model".

Losses and gradients are bit-compatible with the unsharded streaming op
(tested on the 8-device CPU mesh in tests/test_sharded_margin.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vlsfr_tpu.ops.margin_pallas import (
    KTH_TIE_TOL,
    NEG_INF,
    _mxu_pair,
    _normalize_rows,
    _pad_classes,
    _phi_prime,
    _phi_target,
    _tile_modified,
    pallas_margin_partial_bwd,
    pallas_margin_partial_fwd,
)

AXIS = "model"


def _local_partials(emb32, w, local_labels, gt, *, loss_type, margin, mask_svfc,
                    scale, k, normalize_w, tile):
    """Stream the local weight shard: returns (m, s, topk_raw).

    Scan fallback for non-TPU backends — the TPU path is
    pallas_margin_partial_fwd (identical math, kernel-fused)."""
    b, d = emb32.shape
    c = w.shape[0]
    mxu_bf16 = w.dtype == jnp.bfloat16
    wp, n_tiles = _pad_classes(w, c, tile)
    wt = wp.reshape(n_tiles, tile, d)
    gt_col = gt[:, None]

    def body(carry, w_tile_idx):
        m_run, s_run, topk = carry
        w_tile, t = w_tile_idx
        wn = _normalize_rows(w_tile) if normalize_w else w_tile.astype(jnp.float32)
        e_op, w_op = _mxu_pair(emb32, wn, mxu_bf16)
        cos = jnp.dot(e_op, w_op.T, preferred_element_type=jnp.float32)
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cos = jnp.where(valid, cos, NEG_INF)
        is_target = col == local_labels[:, None]
        mod = _tile_modified(cos, is_target, gt_col, valid, loss_type, margin, mask_svfc)
        z = scale * mod
        m_new = jnp.maximum(m_run, jnp.max(z, axis=-1))
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(jnp.exp(z - m_new[:, None]), axis=-1)
        # NON-target columns only (see ops/margin_pallas._stream_fwd)
        topk, _ = jax.lax.top_k(
            jnp.concatenate([topk, jnp.where(is_target, NEG_INF, cos)],
                            axis=-1), k)
        return (m_new, s_run, topk), None

    init = (jnp.full((b,), NEG_INF, jnp.float32), jnp.zeros((b,), jnp.float32),
            jnp.full((b, k), NEG_INF, jnp.float32))
    (m, s, topk), _ = jax.lax.scan(body, init, (wt, jnp.arange(n_tiles)))
    return m, s, topk


def dense_local_bwd_scan(emb32, w_l, ll, pos, gt, logz, kth, d_ce, d_neg, *,
                         loss_type, margin, mask_svfc, scale, k, normalize_w,
                         tile, grad_w=True):
    """Scan twin of ``pallas_margin_partial_bwd``: stream one shard's local
    weight block against the GLOBAL logz/gt/kth (non-TPU fallback; identical
    math, tested equal). ``ll`` are shard-LOCAL labels (-1 = no target column
    in this block); ``pos`` is the GLOBAL positive-row mask — a row can be
    positive while its target lives on another shard, in which case its
    softmax column gradients still flow here. d_ce/d_neg must already be
    masked by ``pos``. Returns (d_emb [B, D] f32 local partial,
    d_w [C_local, D] f32 | None, d_gt_raw [B])."""
    b, d = emb32.shape
    c_local = w_l.shape[0]
    mxu_bf16 = w_l.dtype == jnp.bfloat16
    wp, n_tiles = _pad_classes(w_l, c_local, tile)
    wt = wp.reshape(n_tiles, tile, d)
    gt_col = gt[:, None]
    kth_col = kth[:, None]
    d_ce_col = d_ce[:, None]

    def body(d_emb, w_tile_idx):
        w_tile, t = w_tile_idx
        wn = _normalize_rows(w_tile) if normalize_w else w_tile.astype(jnp.float32)
        e_op, w_op = _mxu_pair(emb32, wn, mxu_bf16)
        cos = jnp.dot(e_op, w_op.T, preferred_element_type=jnp.float32)
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c_local
        cos_v = jnp.where(valid, cos, NEG_INF)
        is_target = col == ll[:, None]
        mod = _tile_modified(cos_v, is_target, gt_col, valid, loss_type, margin, mask_svfc)
        p = jnp.exp(scale * mod - logz[:, None])
        dz = (p - is_target.astype(jnp.float32)) * d_ce_col * scale
        if loss_type == "SV":
            hard = cos_v > (gt_col - margin)
            col_fac = jnp.where(hard & ~is_target, mask_svfc, 1.0)
        else:
            col_fac = 1.0
        d_cos = jnp.where(is_target, 0.0, dz * col_fac)
        d_gt_part = jnp.sum(jnp.where(is_target, dz, 0.0), axis=-1)
        in_topk = (cos_v >= kth_col - KTH_TIE_TOL) & (cos_v > 0) & ~pos[:, None]
        d_cos = d_cos + jnp.where(in_topk, d_neg[:, None] / k, 0.0)
        d_cos = jnp.where(valid, d_cos, 0.0)
        d_emb = d_emb + d_cos @ wn
        if not grad_w:
            return d_emb, (None, d_gt_part)
        d_wn = d_cos.T @ emb32
        if normalize_w:
            w32 = w_tile.astype(jnp.float32)
            n2 = jnp.maximum(jnp.sum(w32 * w32, axis=-1, keepdims=True), 1e-24)
            inv = jax.lax.rsqrt(n2)
            d_w_tile = inv * (d_wn - wn * jnp.sum(d_wn * wn, axis=-1, keepdims=True))
        else:
            d_w_tile = d_wn
        return d_emb, (d_w_tile, d_gt_part)

    d_emb0 = jnp.zeros((b, d), jnp.float32)
    d_emb, (d_w_tiles, d_gt_parts) = jax.lax.scan(
        body, d_emb0, (wt, jnp.arange(n_tiles))
    )
    d_w = d_w_tiles.reshape(-1, d)[:c_local] if grad_w else None
    return d_emb, d_w, jnp.sum(d_gt_parts, axis=0)


def make_sharded_streaming_loss(mesh, *, loss_type="Arc", margin=0.5, scale=32.0,
                                hard_neg=10, mask_svfc=1.2, normalize_w=True,
                                tile=512, data_axis="data", grad_w=True,
                                use_pallas="auto", interpret=False):
    """Returns loss_fn(emb, w, labels) -> (loss, metrics).

    emb [B, D] sharded P(data, None); w [C, D] sharded P(model, None);
    labels [B] global class ids (or -1) sharded P(data).

    ``grad_w=False`` (the FFC-queue use: w is a stop-gradient constant)
    skips the per-shard d_w computation entirely — the backward then only
    re-streams tiles for d_emb, halving its HBM traffic and dropping the
    [C/m, D] gradient store.

    ``use_pallas``: "auto" routes per-shard streams through the Pallas
    kernels on TPU and the scan bodies elsewhere; True/False force.
    """
    kw = dict(loss_type=loss_type, margin=margin, mask_svfc=mask_svfc, scale=scale,
              k=hard_neg, normalize_w=normalize_w, tile=tile)
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"

    @partial(jax.custom_vjp)
    def shard_loss(emb_l, w_l, labels_l):
        (ce, neg), _ = _shard_fwd(emb_l, w_l, labels_l)
        return ce, neg

    def _local_label(labels_l, c_local):
        offset = jax.lax.axis_index(AXIS) * c_local
        ll = labels_l - offset
        owned = (ll >= 0) & (ll < c_local)
        return jnp.where(owned, ll, -1), owned

    def _gt_and_locals(emb_l, w_l, labels_l):
        c_local = w_l.shape[0]
        emb32 = emb_l.astype(jnp.float32)
        ll, owned = _local_label(labels_l, c_local)
        safe = jnp.maximum(ll, 0)
        wl = w_l[safe]
        if normalize_w:
            wl = _normalize_rows(wl)
        gt_part = jnp.sum(emb32 * wl.astype(jnp.float32), axis=-1)
        gt = jax.lax.psum(jnp.where(owned, gt_part, 0.0), AXIS)
        return emb32, ll, owned, gt

    def _shard_fwd(emb_l, w_l, labels_l):
        emb32, ll, owned, gt = _gt_and_locals(emb_l, w_l, labels_l)
        if use_pallas:
            m_l, s_l, topk_l = pallas_margin_partial_fwd(
                emb32, w_l, ll, gt, interpret=interpret, **kw)
        else:
            m_l, s_l, topk_l = _local_partials(emb32, w_l, ll, gt, **kw)
        gmax = jax.lax.pmax(m_l, AXIS)
        s = jax.lax.psum(s_l * jnp.exp(m_l - gmax), AXIS)
        logz = gmax + jnp.log(s)
        topk_all = jax.lax.all_gather(topk_l, AXIS)  # [m, B, k]
        topk_all = jnp.moveaxis(topk_all, 0, 1).reshape(emb_l.shape[0], -1)
        topk, _ = jax.lax.top_k(topk_all, kw["k"])
        pos = labels_l >= 0
        phi = _phi_target(gt, loss_type, margin, mask_svfc)
        ce = jnp.where(pos, logz - scale * phi, 0.0)
        neg = jnp.where(pos, 0.0, jnp.mean(jnp.maximum(topk, 0.0), axis=-1))
        return (ce, neg), (emb_l, w_l, labels_l, gt, logz, topk)

    def _shard_bwd(res, cots):
        emb_l, w_l, labels_l, gt, logz, topk = res
        d_ce, d_neg = cots
        c_local = w_l.shape[0]
        emb32 = emb_l.astype(jnp.float32)
        ll, owned = _local_label(labels_l, c_local)
        pos = labels_l >= 0
        # ce/neg are emitted replicated over the model axis; shard_map splits
        # their cotangents equally across the model shards — reassemble the
        # true cotangent here, then return purely LOCAL partials below and
        # let shard_map's transpose psum them over the unmentioned axes
        # (model for d_emb, data for d_w).
        d_ce = jax.lax.psum(d_ce, AXIS)
        d_neg = jax.lax.psum(d_neg, AXIS)
        d_ce = jnp.where(pos, d_ce, 0.0)
        d_neg = jnp.where(pos, 0.0, d_neg)

        if use_pallas:
            d_emb, d_w, d_gt_raw = pallas_margin_partial_bwd(
                emb32, w_l, ll, gt, logz, topk[:, -1], d_ce, d_neg,
                interpret=interpret, grad_w=grad_w, **kw)
            return _bwd_tail(emb_l, w_l, emb32, ll, owned, pos, gt, d_emb,
                             d_w, d_gt_raw)

        d_emb, d_w, d_gt_raw = dense_local_bwd_scan(
            emb32, w_l, ll, pos, gt, logz, topk[:, -1], d_ce, d_neg,
            grad_w=grad_w, **kw)
        return _bwd_tail(emb_l, w_l, emb32, ll, owned, pos, gt, d_emb, d_w,
                         d_gt_raw)

    def _bwd_tail(emb_l, w_l, emb32, ll, owned, pos, gt, d_emb, d_w, d_gt_raw):
        # the target column lives on exactly one shard; its dz was only
        # produced there, but φ'(gt) routing and the gt-gather grads apply
        # globally — psum the scalar then apply the gather path locally
        d_gt = jax.lax.psum(d_gt_raw, AXIS) * _phi_prime(gt, loss_type, margin)
        safe = jnp.maximum(ll, 0)
        wl = w_l[safe].astype(jnp.float32)
        wln = _normalize_rows(wl) if normalize_w else wl
        own1 = (owned & pos).astype(jnp.float32)[:, None]
        # gt path: local contribution from the owner's normalized row (the
        # final psum below combines it with every shard's column terms)
        d_emb = d_emb + d_gt[:, None] * wln * own1
        if not grad_w:
            return d_emb.astype(emb_l.dtype), jnp.zeros_like(w_l), None
        d_wln = d_gt[:, None] * emb32 * own1
        if normalize_w:
            n2 = jnp.maximum(jnp.sum(wl * wl, axis=-1, keepdims=True), 1e-24)
            inv = jax.lax.rsqrt(n2)
            d_wl = inv * (d_wln - wln * jnp.sum(d_wln * wln, axis=-1, keepdims=True))
        else:
            d_wl = d_wln
        d_w = d_w.at[safe].add(jnp.where(own1 > 0, d_wl, 0.0))
        # d_emb: local (this model shard's columns) — transpose psums over
        # "model". d_w: local (this data shard's rows) — transpose psums over
        # "data", which IS the reduce-scatter of classifier grads (summed
        # over data, already split over model).
        return d_emb.astype(emb_l.dtype), d_w.astype(w_l.dtype), None

    def _fwd_rule(emb_l, w_l, labels_l):
        out, res = _shard_fwd(emb_l, w_l, labels_l)
        return out, res

    shard_loss.defvjp(_fwd_rule, _shard_bwd)

    inner = jax.shard_map(
        shard_loss,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(AXIS, None), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
        check_vma=False,
    )

    def loss_fn(emb, w, labels):
        ce, neg = inner(emb, w, labels)
        pos = (labels >= 0).astype(jnp.float32)
        n_pos = jnp.sum(pos)
        n_out = jnp.sum(1.0 - pos)
        cls = jnp.where(n_pos > 0, jnp.sum(ce) / jnp.maximum(n_pos, 1.0), 0.0)
        neg_l = jnp.where(n_out > 0, jnp.sum(neg) / jnp.maximum(n_out, 1.0), 0.0)
        return cls + neg_l, {"ce": cls, "neg": neg_l}

    return loss_fn
