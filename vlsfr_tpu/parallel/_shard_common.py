"""Shared per-shard machinery for the model-sharded FFC heads
(parallel/sharded_twin.py, parallel/sharded_quad.py).

All functions run INSIDE a shard_map body over the mesh ``model`` axis and
operate on one shard's [2, Q/m, D] queue block with pre-localized write
plans/labels (see ``localize``). The scan functions are the non-TPU
fallback twins of the Pallas partial kernels in ops/twin_margin.py —
identical math, tested equal in tests/test_sharded_twin_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlsfr_tpu.ops.margin_pallas import (
    NEG_INF,
    _mxu_pair,
    _pad_classes,
    _tile_modified,
)
from vlsfr_tpu.ops.twin_margin import (
    _deq_tile,
    _effective_views,
    _gather_plane_deq,
    _view_dcos,
    effective_tile_views,
    twin_write_values,
)

AXIS = "model"


def carriers(g, rows, cols, seen):
    return (g.astype(jnp.float32), rows.astype(jnp.int32),
            cols.astype(jnp.int32), seen.astype(jnp.float32))


def localize(q_l, cols_i, labels_l):
    """Shard-local coordinates: write columns (-1 = other shard) and
    labels (-1 = global outlier, -2 = positive owned by another shard —
    the split keeps the kernels' pos test right for outliers)."""
    c_local = q_l.shape[1]
    c0 = jax.lax.axis_index(AXIS) * c_local
    lcol = cols_i - c0
    in_range = (lcol >= 0) & (lcol < c_local)
    lcol = jnp.where(in_range, lcol, -1)
    ll = labels_l - c0
    owned = (ll >= 0) & (ll < c_local)
    ll = jnp.where(labels_l < 0, -1, jnp.where(owned, ll, -2))
    return c0, c_local, lcol, in_range, ll, owned


def effective_label_rows(q_l, g32, rows_i, cols_i, seen_f, labels_l, owned,
                         ll, qs_l=None):
    """Owner-shard effective label rows (r0e, rbe): gather the label rows,
    apply the in-register write/blend. Collective-free — the backward needs
    only these (gts come from residuals), so it must not pay shard_gts's
    psums. ``qs_l`` is the shard's [2, Q/m] dequant scales for int8-stored
    queues (ops/qqueue.py)."""
    safe = jnp.where(owned, ll, 0)
    r0 = _gather_plane_deq(q_l, qs_l, 0, safe)
    r1 = _gather_plane_deq(q_l, qs_l, 1, safe)
    # global slot ids for the gathered rows → write matching stays global
    gids = jnp.where(owned, labels_l, -1).astype(jnp.int32)
    return _effective_views(r0, r1, gids, g32, rows_i, cols_i, seen_f)


def shard_gts(emb32, q_l, g32, rows_i, cols_i, seen_f, labels_l, owned, ll,
              qs_l=None):
    """Effective-view target cosines: the owner shard gathers its label
    rows, applies the in-register write/blend, psum combines."""
    r0e, rbe = effective_label_rows(q_l, g32, rows_i, cols_i, seen_f,
                                    labels_l, owned, ll, qs_l=qs_l)
    gt1 = jax.lax.psum(jnp.where(owned, jnp.sum(emb32 * r0e, axis=-1), 0.0), AXIS)
    gt2 = jax.lax.psum(jnp.where(owned, jnp.sum(emb32 * rbe, axis=-1), 0.0), AXIS)
    return gt1, gt2, r0e, rbe


def shard_write_values(q_l, g32, rows_i, cols_i, seen_f, lcol, in_range,
                       qs_l=None):
    """Local-range q1 gather + shared twin_write_values
    (ops/twin_margin.py): out-of-shard entries gather row 0 — never
    selected, because no local column matches their slot. The same-slot
    structure inside twin_write_values uses GLOBAL columns (exact)."""
    q1_rows = _gather_plane_deq(q_l, qs_l, 1, jnp.where(in_range, lcol, 0))
    return twin_write_values(q1_rows, g32, rows_i, cols_i, seen_f)


def _tile_scales(qs_l, c_local, tile, n_tiles):
    """Plane-0 per-tile scale rows for the scan fallbacks (None passthrough)."""
    if qs_l is None:
        return None
    s0 = qs_l[0]
    pad = (-c_local) % tile
    if pad:
        s0 = jnp.concatenate([s0, jnp.zeros((pad,), s0.dtype)])
    return s0.reshape(n_tiles, tile)


def scan_partials(emb32, q_l, g32, rows_i, lcol, v, blend_b, ll, gt1, gt2,
                  c_local, mxu_bf16, *, loss_type, margin, scale, k,
                  mask_svfc, tile, qs_l=None):
    """Non-TPU fallback: same per-shard partials as the Pallas twin
    partial forward, as a lax.scan over local plane-0 tiles. Target column
    INCLUDED via φ(gt) on its owner shard (two-stream semantics)."""
    b = emb32.shape[0]
    q0p, n_tiles = _pad_classes(q_l[0], c_local, tile)
    w0s = q0p.reshape(n_tiles, tile, -1)
    s0s = _tile_scales(qs_l, c_local, tile, n_tiles)
    lab2 = ll[:, None]

    def one_view(carry, cos, col, valid, gt_col):
        m_run, s_run, topk = carry
        cos = jnp.where(valid, cos, NEG_INF)
        is_target = col == lab2
        mod = _tile_modified(cos, is_target, gt_col, valid, loss_type,
                             margin, mask_svfc)
        z = scale * mod
        m_new = jnp.maximum(m_run, jnp.max(z, axis=-1))
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(z - m_new[:, None]), axis=-1)
        # NON-target columns only (see the quad kernels' merge comment)
        topk, _ = jax.lax.top_k(
            jnp.concatenate([topk, jnp.where(is_target, NEG_INF, cos)],
                            axis=-1), k)
        return (m_new, s_run, topk)

    def body(carry, wt):
        c1, c2 = carry
        w0_t, t, s0_t = wt
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c_local
        w0e, wbe = effective_tile_views(_deq_tile(w0_t, s0_t), col[0],
                                        g32, rows_i, lcol, v, blend_b,
                                        mxu_bf16=mxu_bf16)
        e1, w1 = _mxu_pair(emb32, w0e, mxu_bf16)
        _, w2 = _mxu_pair(emb32, wbe, mxu_bf16)
        cos1 = jnp.dot(e1, w1.T, preferred_element_type=jnp.float32)
        cos2 = jnp.dot(e1, w2.T, preferred_element_type=jnp.float32)
        c1 = one_view(c1, cos1, col, valid, gt1[:, None])
        c2 = one_view(c2, cos2, col, valid, gt2[:, None])
        return (c1, c2), None

    init = lambda: (jnp.full((b,), NEG_INF, jnp.float32),  # noqa: E731
                    jnp.zeros((b,), jnp.float32),
                    jnp.full((b, k), NEG_INF, jnp.float32))
    (p1, p2), _ = jax.lax.scan(body, (init(), init()),
                               (w0s, jnp.arange(n_tiles), s0s))
    return p1, p2


def scan_bwd(emb32, q_l, g32, rows_i, lcol, v, blend_b, ll, pos, gt1, gt2,
             logz1, logz2, kth1, kth2, d_ce1, d_neg1, d_ce2, d_neg2,
             c_local, mxu_bf16, *, loss_type, margin, scale, k, mask_svfc,
             tile, qs_l=None):
    """Non-TPU fallback of the Pallas twin partial backward: local d_emb
    partial + raw owner-shard dgt accumulations (caller psums + applies
    φ'(gt) and the gt-row tail). ``pos`` is the GLOBAL positive mask."""
    b, d = emb32.shape
    pos2 = pos[:, None]
    lab2 = ll[:, None]
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=k,
              mask_svfc=mask_svfc)
    q0p, n_tiles = _pad_classes(q_l[0], c_local, tile)
    w0s = q0p.reshape(n_tiles, tile, d)
    s0s = _tile_scales(qs_l, c_local, tile, n_tiles)

    def body(carry, wt):
        d_emb, dgt1, dgt2 = carry
        w0_t, t, s0_t = wt
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c_local
        w0e, wbe = effective_tile_views(_deq_tile(w0_t, s0_t), col[0],
                                        g32, rows_i, lcol, v, blend_b,
                                        mxu_bf16=mxu_bf16)
        e1, w1 = _mxu_pair(emb32, w0e, mxu_bf16)
        _, w2 = _mxu_pair(emb32, wbe, mxu_bf16)
        cos1 = jnp.dot(e1, w1.T, preferred_element_type=jnp.float32)
        cos2 = jnp.dot(e1, w2.T, preferred_element_type=jnp.float32)
        dc1, dg1 = _view_dcos(cos1, col, valid, lab2, pos2,
                              gt1[:, None], logz1[:, None], kth1[:, None],
                              d_ce1[:, None], d_neg1[:, None], **kw)
        dc2, dg2 = _view_dcos(cos2, col, valid, lab2, pos2,
                              gt2[:, None], logz2[:, None], kth2[:, None],
                              d_ce2[:, None], d_neg2[:, None], **kw)
        d_emb = d_emb + dc1 @ w0e + dc2 @ wbe
        return (d_emb, dgt1 + dg1[:, 0], dgt2 + dg2[:, 0]), None

    (d_emb, dgt1, dgt2), _ = jax.lax.scan(
        body,
        (jnp.zeros((b, d), jnp.float32), jnp.zeros((b,), jnp.float32),
         jnp.zeros((b,), jnp.float32)),
        (w0s, jnp.arange(n_tiles), s0s))
    return d_emb, dgt1, dgt2


def collective_merge(m_l, s_l, topk_l, k):
    """Global (logz_raw, topk) from per-shard online-softmax partials."""
    b = m_l.shape[0]
    gmax = jax.lax.pmax(m_l, AXIS)
    s = jax.lax.psum(s_l * jnp.exp(m_l - gmax), AXIS)
    logz = gmax + jnp.log(s)
    topk_all = jax.lax.all_gather(topk_l, AXIS)  # [m, B, k]
    topk_all = jnp.moveaxis(topk_all, 0, 1).reshape(b, -1)
    topk, _ = jax.lax.top_k(topk_all, k)
    return logz, topk
