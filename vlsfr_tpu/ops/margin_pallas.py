"""Fused streaming margin-softmax-CE over a huge class axis.

THE hot kernel of the framework (BASELINE.json north star): normalized
embeddings [B, D] × class weights [C, D] with the margin transform, scaled
cross-entropy, and the FFC outlier hard-negative term — **without ever
materializing the [B, C] logits** (at C = 10M, B = 128 that would be 5 GB).

Public entry points: :func:`fused_margin_softmax` (per-row ce/neg with a
custom VJP) and :func:`fused_add_margin` (the reference's scalar reduction).
Two interchangeable execution paths underneath, equivalence-tested against
each other and against ops/margin.py:

* scan streaming (``_stream_fwd``/``_stream_bwd``) — ``lax.scan`` over class
  tiles with an online (flash-style) logsumexp and a running top-k; runs on
  any backend; activation memory stays O(B·tile).
* Pallas TPU kernels (:func:`pallas_margin_ce_fwd` /
  :func:`pallas_margin_ce_bwd`) — class tiles DMA'd HBM→VMEM, the cosine
  block on the MXU (``preferred_element_type=f32``),
  margin/online-softmax/top-k on the VPU in the same pass; the backward is
  tile-relevance-gated. Auto-selected on TPU (``use_pallas="auto"``).

Semantics match reference ffc.py:60-138 exactly (same transforms as
ops/margin.py): labels are class ids or -1 for outlier rows; positives get
margin-CE, outliers get mean(top-hard_neg clipped cosines).

The target-column trick that makes single-pass streaming possible: for every
margin family, the modified target logit φ(gt) depends only on
``gt = cos(emb_i, w_label_i)``, which is one [B, D] gather + dot computed
up-front — so each tile can apply its margin locally, including SVFC's
hard-column test ``cos > gt − m``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# top-k membership in the backward is tested BY VALUE (cos >= kth). The kth
# value is itself one of the cosines, so recomputing cosines in the backward
# with a different summation order (CPU BLAS vs MXU, [B,T] vs [B,M*T] GEMM
# shapes) makes the self-tie flip by 1 ulp. The tolerance keeps the true
# top-k columns in; a near-tie column < 1e-6 below the kth may also receive
# d_neg/k (cosine spacing at |cos|~1 is ~1e-7, so this is rare and benign).
KTH_TIE_TOL = 1e-6


def _normalize_rows(w, eps=1e-12):
    n2 = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=-1, keepdims=True)
    return w * jax.lax.rsqrt(jnp.maximum(n2, eps * eps))


def _mxu_pair(a, b, mxu_bf16: bool):
    """Operand pair for an in-kernel matmul. With ``mxu_bf16`` both operands
    are rounded to bf16 so the dot runs at the MXU's native bf16 rate (f32
    accumulate) instead of the ~4-6× slower multi-pass f32 path. Selected
    when the STORED weights are bf16 (cfg.pool.classifier_dtype /
    queue_dtype): the extra rounding is then the same order as the storage
    rounding already accepted, and the kernels turn from f32-MXU-bound to
    HBM-bound (docs/PERF.md round-2 measurements)."""
    if mxu_bf16:
        return a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return a, b


def _phi_target(gt, loss_type: str, margin: float, mask_svfc: float):
    """Modified target logit value φ(gt) (pre-scale).

    Arc clamps |gt| (gradient of sqrt(1-gt²) diverges at exactly ±1, which a
    converged model reaches; see ops/margin.py)."""
    if loss_type == "AM":
        return gt - margin
    if loss_type == "Arc":
        gt_c = jnp.clip(gt, -1.0 + 1e-6, 1.0 - 1e-6)
        sin = jnp.sqrt(1.0 - gt_c * gt_c)
        return gt_c * np.cos(margin) - sin * np.sin(margin)
    if loss_type == "SV":
        return jnp.where(gt > margin, gt - margin, gt)
    raise ValueError(loss_type)


def _phi_prime(gt, loss_type: str, margin: float):
    """dφ/dgt (the reference's autograd: mask/threshold treated constant).

    Matches the clamped _phi_target: zero slope outside the clamp range."""
    if loss_type == "AM":
        return jnp.ones_like(gt)
    if loss_type == "Arc":
        inside = jnp.abs(gt) < 1.0 - 1e-6
        gt_c = jnp.clip(gt, -1.0 + 1e-6, 1.0 - 1e-6)
        sin = jnp.sqrt(1.0 - gt_c * gt_c)
        return jnp.where(inside, np.cos(margin) + gt_c / sin * np.sin(margin), 0.0)
    if loss_type == "SV":
        return jnp.ones_like(gt)
    raise ValueError(loss_type)


def _tile_modified(cos, is_target, gt_col, valid, loss_type, margin, mask_svfc):
    """Margin-modified logits for one tile (pre-scale). Invalid cols → -inf."""
    if loss_type in ("AM", "Arc"):
        mod = cos
    else:  # SV: boost hard non-target columns
        hard = cos > (gt_col - margin)
        mod = jnp.where(hard, mask_svfc * cos + mask_svfc - 1.0, cos)
    phi = _phi_target(gt_col, loss_type, margin, mask_svfc)
    mod = jnp.where(is_target, phi, mod)
    return jnp.where(valid, mod, NEG_INF)


def compute_gt(emb, w, labels, normalize_w: bool):
    """gt_i = cos(emb_i, w[label_i]) via one row gather (0 for outliers)."""
    safe = jnp.maximum(labels, 0)
    wl = w[safe]
    if normalize_w:
        wl = _normalize_rows(wl)
    return jnp.sum(emb.astype(jnp.float32) * wl.astype(jnp.float32), axis=-1)


# ======================================================================
# scan-based streaming implementation (+ VJP definition)
# ======================================================================


def _pad_classes(w, c, tile):
    pad = (-c) % tile
    if pad:
        w = jnp.concatenate([w, jnp.zeros((pad, w.shape[1]), w.dtype)], axis=0)
    return w, (c + pad) // tile


def _fit_tile(c, tile):
    """Largest 128-multiple ≤ ``tile`` that divides the class axis ``c``.

    The VMEM clamps can return a tile that no longer divides c for
    non-default (b, d) combos; _pad_classes/_pad_queue would then
    CONCATENATE the whole weight/queue array to pad the class axis — a
    multi-GB silent copy per fwd and bwd. Small/odd class counts (no
    128-multiple divisor) keep the clamp: their pad copy is cheap."""
    for t in range(tile // 128 * 128, 0, -128):
        if c % t == 0:
            return t
    return tile


def _stream_fwd(emb, w, labels, gt, *, loss_type, margin, scale, k, mask_svfc,
                normalize_w, tile, with_stats=False):
    b, d = emb.shape
    c = w.shape[0]
    emb32 = emb.astype(jnp.float32)
    wp, n_tiles = _pad_classes(w, c, tile)
    wt = wp.reshape(n_tiles, tile, d)
    gt_col = gt[:, None]

    def body(carry, w_tile_idx):
        m_run, s_run, topk = carry
        w_tile, t = w_tile_idx
        wn = _normalize_rows(w_tile) if normalize_w else w_tile.astype(jnp.float32)
        cos = emb32 @ wn.T  # [B, T]
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cos = jnp.where(valid, cos, NEG_INF)
        is_target = col == labels[:, None]
        mod = _tile_modified(cos, is_target, gt_col, valid, loss_type, margin, mask_svfc)
        z = scale * mod
        m_new = jnp.maximum(m_run, jnp.max(z, axis=-1))
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(jnp.exp(z - m_new[:, None]), axis=-1)
        # top-k over NON-target columns: the hit test gt + TOL >= topk[0]
        # must never compare gt against the kernel's own recomputation of
        # the target column — on TPU the in-kernel f32 dot (bf16-pass
        # decomposition) differs from the outside-computed gt by more than
        # any tie tolerance, silently killing ~half the hits (loss was
        # unaffected: positive rows' topk feeds only the acc metric).
        cand = jnp.concatenate([topk, jnp.where(is_target, NEG_INF, cos)],
                               axis=-1)
        topk, _ = jax.lax.top_k(cand, k)
        ys = (jnp.max(z, axis=-1), jnp.max(cos, axis=-1)) if with_stats else None
        return (m_new, s_run, topk), ys

    m0 = jnp.full((b,), NEG_INF, jnp.float32)
    s0 = jnp.zeros((b,), jnp.float32)
    t0 = jnp.full((b, k), NEG_INF, jnp.float32)
    (m_run, s_run, topk), ys = jax.lax.scan(
        body, (m0, s0, t0), (wt, jnp.arange(n_tiles))
    )
    logz = m_run + jnp.log(s_run)
    phi = _phi_target(gt, loss_type, margin, mask_svfc)
    pos = labels >= 0
    ce = jnp.where(pos, logz - scale * phi, 0.0)
    neg = jnp.where(pos, 0.0, jnp.mean(jnp.maximum(topk, 0.0), axis=-1))
    if with_stats:
        return ce, neg, logz, topk, ys[0], ys[1]
    return ce, neg, logz, topk


def _stream_bwd(emb, w, labels, gt, logz, topk, d_ce, d_neg, *, loss_type, margin,
                scale, k, mask_svfc, normalize_w, tile, grad_w=True):
    """Re-stream tiles, building d_emb and d_w without [B, C] storage.

    ``grad_w=False`` skips the [C, D] gradient entirely (returns None for it)
    — the FFC-queue path, where w is a non-trained constant."""
    b, d = emb.shape
    c = w.shape[0]
    emb32 = emb.astype(jnp.float32)
    wp, n_tiles = _pad_classes(w, c, tile)
    wt = wp.reshape(n_tiles, tile, d)
    gt_col = gt[:, None]
    pos = (labels >= 0)[:, None]
    kth = topk[:, -1][:, None]  # smallest of the running top-k
    # outputs are constant on the "other" row class (ce≡0 on outliers,
    # neg≡0 on positives) → their cotangents must not leak through
    d_ce = jnp.where(labels >= 0, d_ce, 0.0)
    d_neg = jnp.where(labels >= 0, 0.0, d_neg)
    d_gt = jnp.zeros((b,), jnp.float32)

    def body(carry, w_tile_idx):
        d_emb, d_gt = carry
        w_tile, t = w_tile_idx
        wn = _normalize_rows(w_tile) if normalize_w else w_tile.astype(jnp.float32)
        cos = emb32 @ wn.T
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cos_v = jnp.where(valid, cos, NEG_INF)
        is_target = col == labels[:, None]
        mod = _tile_modified(cos_v, is_target, gt_col, valid, loss_type, margin, mask_svfc)
        p = jnp.exp(scale * mod - logz[:, None])  # softmax columns

        # -- CE grad: dce/dz_j = p_j - δ_target ; z_j = s·mod_j
        dz = (p - is_target.astype(jnp.float32)) * d_ce[:, None] * scale
        if loss_type == "SV":
            hard = cos_v > (gt_col - margin)
            col_fac = jnp.where(hard & ~is_target, mask_svfc, 1.0)
        else:
            col_fac = 1.0
        d_cos_ce = jnp.where(is_target, 0.0, dz * col_fac)
        # target-column contribution routes through φ'(gt)
        d_gt = d_gt + jnp.sum(jnp.where(is_target, dz, 0.0), axis=-1) * _phi_prime(
            gt, loss_type, margin
        )

        # -- outlier hard-neg grad: columns in the top-k with cos > 0
        in_topk = (cos_v >= kth - KTH_TIE_TOL) & (cos_v > 0) & ~pos
        d_cos_neg = jnp.where(in_topk, d_neg[:, None] / k, 0.0)

        d_cos = jnp.where(valid, d_cos_ce + d_cos_neg, 0.0)
        d_emb = d_emb + d_cos @ wn
        if not grad_w:
            return (d_emb, d_gt), None
        d_wn = d_cos.T @ emb32  # [T, D]
        if normalize_w:
            w32 = w_tile.astype(jnp.float32)
            n2 = jnp.maximum(jnp.sum(w32 * w32, axis=-1, keepdims=True), 1e-24)
            inv = jax.lax.rsqrt(n2)
            d_w_tile = inv * (d_wn - wn * jnp.sum(d_wn * wn, axis=-1, keepdims=True))
        else:
            d_w_tile = d_wn
        return (d_emb, d_gt), d_w_tile

    (d_emb, d_gt), d_w_tiles = jax.lax.scan(
        body, (jnp.zeros((b, d), jnp.float32), d_gt), (wt, jnp.arange(n_tiles))
    )

    # gt = emb · ŵ_label: route d_gt into emb and the label rows of w
    safe = jnp.maximum(labels, 0)
    wl = w[safe].astype(jnp.float32)
    wln = _normalize_rows(wl) if normalize_w else wl
    pos1 = (labels >= 0).astype(jnp.float32)[:, None]
    d_emb = d_emb + d_gt[:, None] * wln * pos1
    if not grad_w:
        return d_emb.astype(emb.dtype), None
    d_w = d_w_tiles.reshape(-1, d)[:c]
    d_wln = d_gt[:, None] * emb32 * pos1
    if normalize_w:
        n2 = jnp.maximum(jnp.sum(wl * wl, axis=-1, keepdims=True), 1e-24)
        inv = jax.lax.rsqrt(n2)
        d_wl = inv * (d_wln - wln * jnp.sum(d_wln * wln, axis=-1, keepdims=True))
    else:
        d_wl = d_wln
    d_w = d_w.at[safe].add(d_wl)
    return d_emb.astype(emb.dtype), d_w.astype(w.dtype)


# ======================================================================
# Pallas forward kernel
# ======================================================================


def _make_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc, normalize_w,
                     with_stats=False, mxu_bf16=False, partial_out=False):
    def kernel(labels_ref, gt_ref, emb_ref, w_ref,
               ce_ref, neg_ref, logz_ref, topk_ref,
               *stats_and_scratch):
        if with_stats:
            # packed per-tile stats [1, 8, B] (row 0 = max z, row 1 = max cos;
            # rows 2-7 pad the block to Mosaic's (8, 128) tiling minimum)
            stats_ref = stats_and_scratch[0]
            m_scr, s_scr, topk_scr = stats_and_scratch[1:]
        else:
            m_scr, s_scr, topk_scr = stats_and_scratch
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            m_scr[:] = jnp.full((b, 1), NEG_INF, jnp.float32)
            s_scr[:] = jnp.zeros((b, 1), jnp.float32)
            topk_scr[:] = jnp.full((b, k), NEG_INF, jnp.float32)

        w_tile = w_ref[:].astype(jnp.float32)  # [T, D]
        if normalize_w:
            n2 = jnp.maximum(jnp.sum(w_tile * w_tile, axis=-1, keepdims=True), 1e-24)
            w_tile = w_tile * jax.lax.rsqrt(n2)
        e_op, w_op = _mxu_pair(emb_ref[:].astype(jnp.float32), w_tile, mxu_bf16)
        cos = jnp.dot(e_op, w_op.T,
                      preferred_element_type=jnp.float32)  # [B, T] on the MXU

        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cos = jnp.where(valid, cos, NEG_INF)
        labels = labels_ref[:]  # [B, 1]
        gt = gt_ref[:]  # [B, 1]
        is_target = col == labels
        mod = _tile_modified(cos, is_target, gt, valid, loss_type, margin, mask_svfc)
        z = scale * mod

        if with_stats:
            # per-(tile, row) maxima consumed by select_relevant_tiles: the
            # sparse backward keeps only tiles whose softmax mass, top-k
            # membership, or target column can produce a non-negligible grad
            stats_ref[0] = jnp.concatenate(
                [jnp.max(z, axis=-1)[None, :], jnp.max(cos, axis=-1)[None, :],
                 jnp.zeros((6, b), jnp.float32)], axis=0,
            )

        m_old = m_scr[:]  # [B, 1]
        m_new = jnp.maximum(m_old, jnp.max(z, axis=-1, keepdims=True))
        s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(z - m_new), axis=-1, keepdims=True
        )
        m_scr[:] = m_new

        # running top-k merge: k argmax-extraction rounds over [B, k+T].
        # The merge only matters when some row's tile max beats its current
        # kth value — true for ~k·T/C of tiles once the running top-k warms
        # up — so the whole O(k·T) merge is predicated on one cheap check.
        # non-target columns only — see _stream_fwd's merge comment
        cos_neg = jnp.where(is_target, NEG_INF, cos)
        kth_cur = jnp.min(topk_scr[:], axis=-1, keepdims=True)  # [B, 1]
        tile_max = jnp.max(cos_neg, axis=-1, keepdims=True)
        needs_merge = jnp.any(tile_max > kth_cur)

        @pl.when(needs_merge)
        def _merge():
            buf = jnp.concatenate([topk_scr[:], cos_neg], axis=-1)
            buf_col = jax.lax.broadcasted_iota(jnp.int32, (b, k + tile), 1)
            new_topk = []
            for _ in range(k):
                vmax = jnp.max(buf, axis=-1, keepdims=True)
                amax = jnp.argmax(buf, axis=-1)[:, None]
                new_topk.append(vmax)
                buf = jnp.where(buf_col == amax, NEG_INF, buf)
            topk_scr[:] = jnp.concatenate(new_topk, axis=-1)

        @pl.when(t == n_t - 1)
        def _finalize():
            if partial_out:
                # per-shard partials (parallel/sharded_margin.py): the raw
                # online-softmax state rides the (ce, neg) output slots
                ce_ref[:] = m_scr[:]
                neg_ref[:] = s_scr[:]
                topk_ref[:] = topk_scr[:]
                return
            logz = m_scr[:] + jnp.log(s_scr[:])
            phi = _phi_target(gt, loss_type, margin, mask_svfc)
            pos = labels >= 0
            ce_ref[:] = jnp.where(pos, logz - scale * phi, 0.0)
            neg_ref[:] = jnp.where(
                pos, 0.0, jnp.mean(jnp.maximum(topk_scr[:], 0.0), axis=-1, keepdims=True)
            )
            logz_ref[:] = logz
            topk_ref[:] = topk_scr[:]

    return kernel


def pallas_margin_ce_fwd(emb, w, labels, gt, *, loss_type, margin, scale, k,
                         mask_svfc, normalize_w, tile=512, interpret=False,
                         with_stats=False):
    """Forward pass on TPU: returns (ce [B], neg [B], logz [B], topk [B,k]).

    With ``with_stats`` also returns (maxz [n_tiles, B], maxcos [n_tiles, B]),
    the per-tile row maxima that feed :func:`select_relevant_tiles`.

    bf16-stored ``w`` selects the bf16 MXU path for the cosine block (see
    :func:`_mxu_pair`); f32 weights keep exact f32 math."""
    b, d = emb.shape
    c = w.shape[0]
    # clamp tile so the double-buffered w_tile + the [B, tile] working set
    # fit the VMEM budget
    max_tile = max(256, int((11 * 2**20) // (8 * d + 24 * b)) // 128 * 128)
    tile = _fit_tile(c, min(tile, max_tile))
    wp, n_tiles = _pad_classes(w, c, tile)
    kernel = _make_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                              mask_svfc, normalize_w, with_stats=with_stats,
                              mxu_bf16=w.dtype == jnp.bfloat16)
    out_specs = [
        pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, k), jnp.float32),
    ]
    if with_stats:
        out_specs += [
            pl.BlockSpec((1, 8, b), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n_tiles, 8, b), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # labels
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # gt
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),  # emb
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),  # w tile
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, k), jnp.float32),
        ],
        interpret=interpret,
    )(labels.astype(jnp.int32)[:, None], gt[:, None].astype(jnp.float32),
      emb, wp)
    ce, neg, logz, topk = out[:4]
    if with_stats:
        stats = out[4]
        return ce[:, 0], neg[:, 0], logz[:, 0], topk, stats[:, 0, :], stats[:, 1, :]
    return ce[:, 0], neg[:, 0], logz[:, 0], topk


# ======================================================================
# Pallas backward kernel
# ======================================================================


def _make_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc, normalize_w,
                     emit_dw=True, mxu_bf16=False):
    def kernel(labels_ref, gt_ref, logz_ref, kth_ref, dce_ref, dneg_ref,
               emb_ref, w_ref,
               *outs_and_scratch):
        if emit_dw:
            dw_ref, demb_ref, dgt_ref = outs_and_scratch[:3]
            demb_scr, dgt_scr = outs_and_scratch[3:]
        else:
            dw_ref = None
            demb_ref, dgt_ref = outs_and_scratch[:2]
            demb_scr, dgt_scr = outs_and_scratch[2:]
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            demb_scr[:] = jnp.zeros((b, d), jnp.float32)
            dgt_scr[:] = jnp.zeros((b, 1), jnp.float32)

        labels = labels_ref[:]  # [B,1]
        gt = gt_ref[:]
        logz = logz_ref[:]
        kth = kth_ref[:]
        d_ce = dce_ref[:]
        d_neg = dneg_ref[:]
        pos = labels >= 0

        emb = emb_ref[:].astype(jnp.float32)
        w_tile = w_ref[:].astype(jnp.float32)
        if normalize_w:
            n2 = jnp.maximum(jnp.sum(w_tile * w_tile, axis=-1, keepdims=True), 1e-24)
            inv = jax.lax.rsqrt(n2)
            wn = w_tile * inv
        else:
            inv = None
            wn = w_tile
        e_op, wn_op = _mxu_pair(emb, wn, mxu_bf16)
        cos = jnp.dot(e_op, wn_op.T, preferred_element_type=jnp.float32)  # [B, T]
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cos_v = jnp.where(valid, cos, NEG_INF)
        is_target = col == labels
        mod = _tile_modified(cos_v, is_target, gt, valid, loss_type, margin, mask_svfc)
        z = scale * mod

        # tile-relevance gate: softmax columns with z − logz < −20 carry
        # p < 2e-9 — below fp32 gradient noise. Once a model concentrates its
        # probability mass, most class tiles fail all three tests and the
        # whole exp/select/matmul block is skipped (dw written as zeros).
        ce_mass = jnp.any((jnp.max(z, axis=-1, keepdims=True) - logz > -20.0) & (d_ce != 0))
        has_target = jnp.any(is_target & (d_ce != 0))
        has_topk = jnp.any((cos_v >= kth - KTH_TIE_TOL) & (cos_v > 0) & jnp.logical_not(pos) & (d_neg != 0))
        needs_work = ce_mass | has_target | has_topk

        @pl.when(needs_work)
        def _heavy():
            p = jnp.exp(z - logz)
            dz = (p - is_target.astype(jnp.float32)) * d_ce * scale
            if loss_type == "SV":
                hard = cos_v > (gt - margin)
                col_fac = jnp.where(hard & ~is_target, mask_svfc, 1.0)
            else:
                col_fac = 1.0
            d_cos = jnp.where(is_target, 0.0, dz * col_fac)
            dgt_scr[:] = dgt_scr[:] + jnp.sum(
                jnp.where(is_target, dz, 0.0), axis=-1, keepdims=True
            )
            in_topk = (cos_v >= kth - KTH_TIE_TOL) & (cos_v > 0) & jnp.logical_not(pos)
            d_cos2 = d_cos + jnp.where(in_topk, d_neg / k, 0.0)
            d_cos2 = jnp.where(valid, d_cos2, 0.0)
            dc_op, _ = _mxu_pair(d_cos2, d_cos2, mxu_bf16)
            demb_scr[:] = demb_scr[:] + jnp.dot(dc_op, wn_op, preferred_element_type=jnp.float32)
            if emit_dw:
                d_wn = jnp.dot(dc_op.T, e_op, preferred_element_type=jnp.float32)  # [T, D]
                # NOTE: storing d_w in the classifier dtype (bf16) was
                # measured SLOWER than this f32 store + XLA-side cast
                # (61.6 vs 60.1 ms/step at C=1M bf16) — keep the f32 store;
                # it also keeps the gradient itself exact.
                if normalize_w:
                    dw_ref[:] = inv * (d_wn - wn * jnp.sum(d_wn * wn, axis=-1, keepdims=True))
                else:
                    dw_ref[:] = d_wn

        if emit_dw:
            @pl.when(jnp.logical_not(needs_work))
            def _skip():
                dw_ref[:] = jnp.zeros((tile, d), jnp.float32)

        @pl.when(t == n_t - 1)
        def _finalize():
            demb_ref[:] = demb_scr[:]
            dgt_ref[:] = dgt_scr[:]

    return kernel


def pallas_margin_ce_bwd(emb, w, labels, gt, logz, topk, d_ce, d_neg, *, loss_type,
                         margin, scale, k, mask_svfc, normalize_w, tile=512,
                         interpret=False, grad_w=True):
    """Pallas backward: grid over class tiles, d_w written per tile block,
    d_emb/d_gt accumulated in VMEM. The gt-gather path (label-row grads) is
    applied by the caller in XLA (one B-row scatter).

    ``grad_w=False`` compiles a kernel with NO d_w output at all — the right
    backward when ``w`` is a non-trained constant (the FFC queue): it skips
    the dense [C, D] gradient write, which is the HBM floor of this op (a
    2 GB store at C=1M that XLA cannot dead-code out of an opaque kernel).
    Returns (d_emb, None) in that mode."""
    b, d = emb.shape
    c = w.shape[0]
    # VMEM budget: Mosaic double-buffers the blocked w_tile input AND (when
    # emitted) the d_w tile output, plus ~6 [B, tile] f32 working buffers
    w_bufs = 16 if grad_w else 8
    max_tile = max(256, int((11 * 2**20) // (w_bufs * d + 24 * b)) // 128 * 128)
    tile = _fit_tile(c, min(tile, max_tile))
    wp, n_tiles = _pad_classes(w, c, tile)
    kernel = _make_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                              mask_svfc, normalize_w, emit_dw=grad_w,
                              mxu_bf16=w.dtype == jnp.bfloat16)
    pos = labels >= 0
    d_ce = jnp.where(pos, d_ce, 0.0).astype(jnp.float32)
    d_neg = jnp.where(pos, 0.0, d_neg).astype(jnp.float32)
    kth = topk[:, -1]
    vec = lambda v: v[:, None].astype(jnp.float32)  # noqa: E731
    out_specs = [
        pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, d), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
    ]
    if grad_w:
        out_specs = [
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ] + out_specs
        out_shape = [jax.ShapeDtypeStruct((n_tiles * tile, d), jnp.float32)] + out_shape
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # labels
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # gt
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # logz
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # kth
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # d_ce
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # d_neg
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),  # emb
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),  # w tile
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(labels.astype(jnp.int32)[:, None], vec(gt), vec(logz), vec(kth), vec(d_ce),
      vec(d_neg), emb.astype(jnp.float32), wp)
    if grad_w:
        dw_p, d_emb, d_gt = out
        d_w = dw_p[:c]
    else:
        d_emb, d_gt = out
        d_w = None

    # gt-gather path (cheap, XLA): φ'(gt) routing into emb and w[labels]
    d_gt = d_gt[:, 0] * _phi_prime(gt, loss_type, margin)
    emb32 = emb.astype(jnp.float32)
    safe = jnp.maximum(labels, 0)
    wl = w[safe].astype(jnp.float32)
    wln = _normalize_rows(wl) if normalize_w else wl
    pos1 = pos.astype(jnp.float32)[:, None]
    d_emb = d_emb + d_gt[:, None] * wln * pos1
    if not grad_w:
        return d_emb.astype(emb.dtype), None
    d_wln = d_gt[:, None] * emb32 * pos1
    if normalize_w:
        n2 = jnp.maximum(jnp.sum(wl * wl, axis=-1, keepdims=True), 1e-24)
        inv = jax.lax.rsqrt(n2)
        d_wl = inv * (d_wln - wln * jnp.sum(d_wln * wln, axis=-1, keepdims=True))
    else:
        d_wl = d_wln
    d_w = d_w.at[safe].add(d_wl)
    return d_emb.astype(emb.dtype), d_w.astype(w.dtype)


# ======================================================================
# fused-SGD backward: classifier update applied inside the streaming pass
# ======================================================================
#
# The dense streaming backward materializes d_w [C, D] f32 only for optax
# to re-read it once and throw it away: at C=1M that is a 2.1 GB store +
# 2.1 GB load + an extra 1 GB classifier read per step, on a path that is
# already HBM-bound (0.82 of the roofline, docs/PERF.md round 3). The
# SGD-momentum chain this repo uses for the classifier
# (optim/optimizers.py: add_decayed_weights → trace(μ, nesterov) →
# -lr) is elementwise per row, so it can run in the SAME pass that
# computes each d_w tile — the gradient then never exists in HBM:
#
#   g     = d_w + wd·w
#   mom'  = μ·mom + g
#   upd   = g + μ·mom'   (nesterov)  |  mom'  (heavy-ball)  |  g  (μ=0)
#   w'    = w − lr·upd
#
# Per-tile traffic drops from {w read, d_w write} + {d_w read, w read,
# w write, mom read, mom write} to {w read, mom read, w write, mom write}.
#
# The gt-gather tail (target-row gradient, applied by the dense caller as
# one B-row scatter-add into d_w) CANNOT stay a post-kernel scatter here:
# XLA materializes a full copy of each scattered custom-call output
# (measured 9.8 ms/step at C=1M bf16 — new_w 2.1 GB + new_mom 8.4 GB of
# copy traffic, the 5-step xplane trace's copy.1347/1348). Instead the
# tail is folded INTO the stream: d_gt is analytic from the forward
# outputs —
#
#   z_target (in-tile) = scale·φ(gt)  exactly (_tile_modified substitutes
#   φ(gt_col) at the target column), so
#   d_gt_raw = (exp(scale·φ(gt) − logz) − 1) · d_ce · scale
#
# — which lets the caller build the full target-row parameter gradient
# d_wl [B, D] (φ′ chain + w-normalization backprop on the gathered
# PRE-update rows) BEFORE the kernel runs. Each tile owning a target row
# adds it with one one-hot MXU dot, is_targetᵀ[T,B] @ d_wl[B,D], gated by
# pl.when(has_target) — at most B of the C/tile tiles pay it.
#
# NOT eligible: global-norm gradient clipping (optim.grad_clip > 0 couples
# the classifier update to backbone gradients that don't exist yet) and
# RMSprop (per-element second-moment state would fuse the same way, but
# the reference trains SGD; add it when needed). The train-step router
# (train/softmax_head.py) checks both.


def _make_bwd_fused_sgd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                               mask_svfc, normalize_w, mxu_bf16, w_dtype,
                               mom_dtype, momentum, nesterov, weight_decay):
    def kernel(labels_ref, gt_ref, logz_ref, kth_ref, dce_ref, dneg_ref,
               lr_ref, emb_ref, dwl_ref, w_ref, mom_ref,
               new_w_ref, new_mom_ref, demb_ref,
               demb_scr):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            demb_scr[:] = jnp.zeros((b, d), jnp.float32)

        labels = labels_ref[:]  # [B,1]
        gt = gt_ref[:]
        logz = logz_ref[:]
        kth = kth_ref[:]
        d_ce = dce_ref[:]
        d_neg = dneg_ref[:]
        lr = lr_ref[0, 0]
        pos = labels >= 0

        emb = emb_ref[:].astype(jnp.float32)
        w_tile = w_ref[:].astype(jnp.float32)
        if normalize_w:
            n2 = jnp.maximum(jnp.sum(w_tile * w_tile, axis=-1, keepdims=True), 1e-24)
            inv = jax.lax.rsqrt(n2)
            wn = w_tile * inv
        else:
            inv = None
            wn = w_tile
        e_op, wn_op = _mxu_pair(emb, wn, mxu_bf16)
        cos = jnp.dot(e_op, wn_op.T, preferred_element_type=jnp.float32)  # [B, T]
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cos_v = jnp.where(valid, cos, NEG_INF)
        is_target = col == labels
        mod = _tile_modified(cos_v, is_target, gt, valid, loss_type, margin, mask_svfc)
        z = scale * mod

        def _apply_update(d_w):
            """SGD chain on this tile; d_w is the in-register gradient."""
            g = d_w
            if weight_decay:
                g = g + weight_decay * w_tile
            if momentum:
                mom_new = momentum * mom_ref[:].astype(jnp.float32) + g
                upd = g + momentum * mom_new if nesterov else mom_new
            else:
                mom_new = g
                upd = g
            new_mom_ref[:] = mom_new.astype(mom_dtype)
            new_w_ref[:] = (w_tile - lr * upd).astype(w_dtype)

        def _dw_tile():
            """The streamed part of this tile's d_w (target columns routed
            separately via d_wl); accumulates d_emb as a side effect."""
            p = jnp.exp(z - logz)
            dz = (p - is_target.astype(jnp.float32)) * d_ce * scale
            if loss_type == "SV":
                hard = cos_v > (gt - margin)
                col_fac = jnp.where(hard & ~is_target, mask_svfc, 1.0)
            else:
                col_fac = 1.0
            d_cos = jnp.where(is_target, 0.0, dz * col_fac)
            in_topk = (cos_v >= kth - KTH_TIE_TOL) & (cos_v > 0) & jnp.logical_not(pos)
            d_cos2 = d_cos + jnp.where(in_topk, d_neg / k, 0.0)
            d_cos2 = jnp.where(valid, d_cos2, 0.0)
            dc_op, _ = _mxu_pair(d_cos2, d_cos2, mxu_bf16)
            demb_scr[:] = demb_scr[:] + jnp.dot(dc_op, wn_op, preferred_element_type=jnp.float32)
            d_wn = jnp.dot(dc_op.T, e_op, preferred_element_type=jnp.float32)  # [T, D]
            if normalize_w:
                return inv * (d_wn - wn * jnp.sum(d_wn * wn, axis=-1, keepdims=True))
            return d_wn

        # same tile-relevance gate as the dense backward: skip the
        # exp/select/matmul block on tiles carrying no gradient mass —
        # the momentum decay + weight decay still run (they must, every
        # step, for optax equivalence)
        ce_mass = jnp.any((jnp.max(z, axis=-1, keepdims=True) - logz > -20.0) & (d_ce != 0))
        has_target = jnp.any(is_target & (d_ce != 0))
        has_topk = jnp.any((cos_v >= kth - KTH_TIE_TOL) & (cos_v > 0) & jnp.logical_not(pos) & (d_neg != 0))
        needs_work = ce_mass | has_target | has_topk

        # three-way split so the one-hot target-row dot runs ONLY on the
        # ≤B tiles that own a target (is_target is exact 0/1 — the dot is
        # an exact row-select of d_wl, f32 on the MXU)
        @pl.when(needs_work & has_target)
        def _heavy_target():
            itf = is_target.astype(jnp.float32)
            extra = jnp.dot(itf.T, dwl_ref[:], preferred_element_type=jnp.float32)
            _apply_update(_dw_tile() + extra)

        @pl.when(needs_work & jnp.logical_not(has_target))
        def _heavy():
            _apply_update(_dw_tile())

        @pl.when(jnp.logical_not(needs_work))
        def _skip():
            _apply_update(jnp.zeros((tile, d), jnp.float32))

        @pl.when(t == n_t - 1)
        def _finalize():
            demb_ref[:] = demb_scr[:]

    return kernel


def pallas_margin_ce_bwd_fused_sgd(emb, w, mom, labels, gt, logz, topk, d_ce,
                                   d_neg, lr, *, momentum, nesterov,
                                   weight_decay, loss_type, margin, scale, k,
                                   mask_svfc, normalize_w, tile=512,
                                   interpret=False, pos_rows=None):
    """Streaming backward with the classifier SGD-momentum update fused in.

    Returns (d_emb [B, D], new_w [C, D] w.dtype, new_mom [C, D] mom.dtype,
    f32 default) where
    new_w/new_mom are exactly what optax's wd→trace(μ,nesterov)→(-lr)
    chain would produce from the dense d_w. The target-row gradient is
    computed analytically BEFORE the kernel and routed in as ``d_wl`` (see
    the section comment) — post-kernel scatters on the [C, D] outputs are
    forbidden: XLA copies the whole scattered custom-call output
    (measured 9.8 ms/step at C=1M). ``lr`` may be a traced scalar
    (schedules stay recompilation-free).

    ``pos_rows`` (sharded use, parallel/sharded_fused.py): rows that are
    positive GLOBALLY but whose target column lives on another shard pass
    ``labels=-1`` here (no local target, no local tail) while
    ``pos_rows=True`` keeps their d_ce routing — the softmax column
    gradient exists on every shard. Default (None) = ``labels >= 0``, the
    single-chip semantics.
    """
    b, d = emb.shape
    c = w.shape[0]
    # VMEM: double-buffered per tile row — w in/out at its own dtype, mom
    # in/out at ITS dtype (f32 default; bf16 = the traffic study in
    # docs/PERF.md) — plus ~6 [B, tile] f32 working buffers
    w_bufs = (4 * jnp.dtype(mom.dtype).itemsize
              + 4 * jnp.dtype(w.dtype).itemsize)
    max_tile = max(256, int((11 * 2**20) // (w_bufs * d + 24 * b)) // 128 * 128)
    tile = _fit_tile(c, min(tile, max_tile))
    wp, n_tiles = _pad_classes(w, c, tile)
    mp, _ = _pad_classes(mom, c, tile)
    kernel = _make_bwd_fused_sgd_kernel(
        b, d, c, tile, k, loss_type, margin, scale, mask_svfc, normalize_w,
        mxu_bf16=w.dtype == jnp.bfloat16, w_dtype=w.dtype,
        mom_dtype=mom.dtype, momentum=momentum, nesterov=nesterov,
        weight_decay=weight_decay)
    owned = labels >= 0  # rows whose target column lives in THIS w block
    pos = owned if pos_rows is None else pos_rows
    d_ce = jnp.where(pos, d_ce, 0.0).astype(jnp.float32)
    d_neg = jnp.where(pos, 0.0, d_neg).astype(jnp.float32)
    kth = topk[:, -1]
    emb32 = emb.astype(jnp.float32)

    # gt tail, analytic (the in-tile target logit is exactly scale·φ(gt)):
    # raw dz at the target column, then the φ′ chain, then the
    # w-normalization backprop on the gathered PRE-update target rows.
    # Gated by ``owned``: the tail is the TARGET-COLUMN gradient, applied
    # exactly once — on the shard (or single chip) holding that row.
    p_t = jnp.exp(scale * _phi_target(gt, loss_type, margin, mask_svfc) - logz)
    d_gt = jnp.where(owned, (p_t - 1.0) * d_ce * scale, 0.0)
    d_gt = d_gt * _phi_prime(gt, loss_type, margin)
    safe = jnp.maximum(labels, 0)
    wl = w[safe].astype(jnp.float32)
    wln = _normalize_rows(wl) if normalize_w else wl
    pos1 = owned.astype(jnp.float32)[:, None]
    d_wln = d_gt[:, None] * emb32 * pos1
    if normalize_w:
        n2 = jnp.maximum(jnp.sum(wl * wl, axis=-1, keepdims=True), 1e-24)
        inv = jax.lax.rsqrt(n2)
        d_wl = inv * (d_wln - wln * jnp.sum(d_wln * wln, axis=-1, keepdims=True))
    else:
        d_wl = d_wln

    vec = lambda v: v[:, None].astype(jnp.float32)  # noqa: E731
    new_w_p, new_mom_p, d_emb = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # labels
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # gt
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # logz
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # kth
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # d_ce
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # d_neg
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),  # lr
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),  # emb
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),  # d_wl
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),  # w tile
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),  # mom tile
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile, d), w.dtype),
            jax.ShapeDtypeStruct((n_tiles * tile, d), mom.dtype),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
        ],
        # the update is IN-PLACE: w → new_w, mom → new_mom. Without this,
        # XLA's buffer assignment reuses the donated state buffers for the
        # outputs anyway and preserves the input values with full [C, D]
        # copies at step start — measured 9.8 ms/step at C=1M bf16
        # (copy.1347/1348 in the xplane trace). Only valid when no class
        # padding happened (aliasing needs matching shapes; _fit_tile makes
        # this the common case).
        input_output_aliases=(
            {9: 0, 10: 1} if n_tiles * tile == c else {}
        ),
        interpret=interpret,
    )(labels.astype(jnp.int32)[:, None], vec(gt), vec(logz), vec(kth),
      vec(d_ce), vec(d_neg), jnp.asarray(lr, jnp.float32).reshape(1, 1),
      emb32, d_wl, wp, mp)
    new_w = new_w_p[:c]
    new_mom = new_mom_p[:c]
    # d_emb's target-column term (d_gt routed into the embedding) — [B, D],
    # cheap XLA elementwise
    d_emb = d_emb + d_gt[:, None] * wln * pos1
    return d_emb.astype(emb.dtype), new_w, new_mom


def streaming_margin_grads_fused_sgd(
    emb, w, mom, labels, d_ce, d_neg, lr, *, momentum, nesterov, weight_decay,
    loss_type="Arc", margin=0.5, scale=32.0, hard_neg=1, mask_svfc=1.2,
    normalize_w=True, tile=512, use_pallas="auto",
):
    """Explicit fwd+bwd with the classifier SGD update fused into the
    backward stream — the dense [C, D] gradient never exists in HBM.

    Like streaming_sparse_margin_grads this runs OUTSIDE jax.grad: the
    caller supplies the output cotangents (d_ce/d_neg [B]), feeds d_emb
    into the backbone via jax.vjp, and swaps (new_w, new_mom) into the
    train state. Semantics == dense streaming + the optax SGD chain,
    bit-exact in f32 (tests/test_fused_update.py); classifier_dtype
    bfloat16 adds one extra bf16 rounding on the B target rows.

    Returns (ce, neg, topk, gt, d_emb, new_w, new_mom).
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    gt = compute_gt(emb, w, labels, normalize_w)
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
              mask_svfc=mask_svfc, normalize_w=normalize_w, tile=tile)
    fwd = pallas_margin_ce_fwd if use_pallas else _stream_fwd
    ce, neg, logz, topk = fwd(emb, w, labels, gt, **kw)
    if use_pallas:
        d_emb, new_w, new_mom = pallas_margin_ce_bwd_fused_sgd(
            emb, w, mom, labels, gt, logz, topk, d_ce, d_neg, lr,
            momentum=momentum, nesterov=nesterov, weight_decay=weight_decay,
            **kw)
    else:
        # CPU/test fallback: dense d_w (scan) + the same optax chain in jnp —
        # the reference semantics the kernel is tested against
        d_emb, d_w = _stream_bwd(
            emb, w, labels, gt, logz, topk, d_ce, d_neg, grad_w=True, **kw)
        new_w, new_mom = apply_sgd_dense(
            w, mom, d_w, lr, momentum=momentum, nesterov=nesterov,
            weight_decay=weight_decay)
    return ce, neg, jax.lax.stop_gradient(topk), gt, d_emb, new_w, new_mom


def apply_sgd_dense(w, mom, d_w, lr, *, momentum, nesterov, weight_decay):
    """The optax wd → trace(μ, nesterov) → (-lr) chain as one jnp update
    (optim/optimizers.py semantics; used by the fused path's CPU fallback
    and as the test oracle for the fused kernel)."""
    g = d_w.astype(jnp.float32)
    if weight_decay:
        g = g + weight_decay * w.astype(jnp.float32)
    if momentum:
        new_mom = momentum * mom.astype(jnp.float32) + g
        upd = g + momentum * new_mom if nesterov else new_mom
    else:
        new_mom = g
        upd = g
    new_w = (w.astype(jnp.float32) - lr * upd).astype(w.dtype)
    return new_w, new_mom.astype(mom.dtype)


# ======================================================================
# per-shard partial kernels (parallel/sharded_margin.py's hot path)
# ======================================================================
#
# The model-sharded streaming softmax splits the class weights row-wise
# over the mesh "model" axis. Each shard streams its local [C/m, D] block
# with these kernels; the composition merges the per-shard online-softmax
# states with pmax/psum/all_gather and applies the owner-shard gt tail.
# ``labels`` arrive localized (-1 for rows owned elsewhere or outliers);
# ``gt``/``logz``/``kth`` are GLOBAL (already collective-merged).


def pallas_margin_partial_fwd(emb, w, local_labels, gt, *, loss_type, margin,
                              scale, k, mask_svfc, normalize_w, tile=512,
                              interpret=False):
    """One shard's streaming forward partials: (m [B], s [B], topk [B, k])."""
    b, d = emb.shape
    c = w.shape[0]
    max_tile = max(256, int((11 * 2**20) // (8 * d + 24 * b)) // 128 * 128)
    tile = _fit_tile(c, min(tile, max_tile))
    wp, n_tiles = _pad_classes(w, c, tile)
    kernel = _make_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                              mask_svfc, normalize_w, partial_out=True,
                              mxu_bf16=w.dtype == jnp.bfloat16)

    def adapter(labels_ref, gt_ref, emb_ref, w_ref, m_ref, s_ref, topk_ref,
                *scratch):
        kernel(labels_ref, gt_ref, emb_ref, w_ref,
               m_ref, s_ref, None, topk_ref, *scratch)

    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    m, s, topk = pl.pallas_call(
        adapter,
        grid=(n_tiles,),
        in_specs=[
            bspec, bspec,
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[bspec, bspec,
                   pl.BlockSpec((b, k), lambda t: (0, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, k), jnp.float32),
        ],
        interpret=interpret,
    )(local_labels.astype(jnp.int32)[:, None], gt[:, None].astype(jnp.float32),
      emb.astype(jnp.float32), wp)
    return m[:, 0], s[:, 0], topk


def pallas_margin_partial_bwd(emb, w, local_labels, gt, logz, kth, d_ce, d_neg,
                              *, loss_type, margin, scale, k, mask_svfc,
                              normalize_w, tile=512, interpret=False,
                              grad_w=True):
    """One shard's streaming backward against GLOBAL (gt, logz, kth):
    (d_emb_partial, d_w_local_or_None, d_gt_raw).

    No gt tail here — the composition psums d_gt_raw over "model", applies
    φ'(gt), and routes the owner-shard label-row terms itself. The caller
    must pre-mask d_ce/d_neg with the GLOBAL pos/outlier split."""
    b, d = emb.shape
    c = w.shape[0]
    w_bufs = 16 if grad_w else 8
    max_tile = max(256, int((11 * 2**20) // (w_bufs * d + 24 * b)) // 128 * 128)
    tile = _fit_tile(c, min(tile, max_tile))
    wp, n_tiles = _pad_classes(w, c, tile)
    kernel = _make_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                              mask_svfc, normalize_w, emit_dw=grad_w,
                              mxu_bf16=w.dtype == jnp.bfloat16)
    vec = lambda x: x[:, None].astype(jnp.float32)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        bspec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, d), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
    ]
    if grad_w:
        out_specs = [
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ] + out_specs
        out_shape = [jax.ShapeDtypeStruct((n_tiles * tile, d), jnp.float32)] + out_shape
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[bspec] * 6 + [
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(local_labels.astype(jnp.int32)[:, None], vec(gt), vec(logz), vec(kth),
      vec(d_ce), vec(d_neg), emb.astype(jnp.float32), wp)
    if grad_w:
        dw_p, d_emb, d_gt = out
        return d_emb, dw_p[:c], d_gt[:, 0]
    d_emb, d_gt = out
    return d_emb, None, d_gt[:, 0]


# ======================================================================
# public custom-VJP op
# ======================================================================


@partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
)
def fused_margin_softmax(emb, w, labels, loss_type="Arc", margin=0.5, scale=32.0,
                         hard_neg=10, mask_svfc=1.2, normalize_w=True, tile=512,
                         use_pallas="auto", grad_w=True):
    """(ce [B], neg [B], topk [B, hard_neg]) without materializing [B, C] logits.

    ``ce``: margin-softmax cross-entropy per positive row (0 on outliers);
    ``neg``: mean top-``hard_neg`` clipped cosine per outlier row (0 on
    positives). Sum/mask/mean is the caller's choice (cf. ops.margin.add_margin).
    ``topk``: the running top-``hard_neg`` raw cosines over ALL columns — a
    monitoring output (top-1 accuracy, hardest-negative stats); gradients do
    not flow through it.

    ``grad_w=False`` declares ``w`` a non-trained constant (the FFC queue):
    the backward then never computes/writes the dense [C, D] gradient —
    at C=1M that is 2 GB of HBM stores XLA could not otherwise eliminate
    from the opaque fused kernel.
    """
    ce, neg, _, topk = _fwd_impl(emb, w, labels, loss_type, margin, scale, hard_neg,
                                 mask_svfc, normalize_w, tile, use_pallas)
    return ce, neg, jax.lax.stop_gradient(topk)


def _fwd_impl(emb, w, labels, loss_type, margin, scale, hard_neg, mask_svfc,
              normalize_w, tile, use_pallas, gt=None):
    if gt is None:
        gt = compute_gt(emb, w, labels, normalize_w)
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        ce, neg, logz, topk = pallas_margin_ce_fwd(
            emb, w, labels, gt, loss_type=loss_type, margin=margin, scale=scale,
            k=hard_neg, mask_svfc=mask_svfc, normalize_w=normalize_w, tile=tile,
        )
    else:
        ce, neg, logz, topk = _stream_fwd(
            emb, w, labels, gt, loss_type=loss_type, margin=margin, scale=scale,
            k=hard_neg, mask_svfc=mask_svfc, normalize_w=normalize_w, tile=tile,
        )
    return ce, neg, logz, topk


def _vjp_fwd(emb, w, labels, loss_type, margin, scale, hard_neg, mask_svfc,
             normalize_w, tile, use_pallas, grad_w):
    gt = compute_gt(emb, w, labels, normalize_w)
    ce, neg, logz, topk = _fwd_impl(emb, w, labels, loss_type, margin, scale,
                                    hard_neg, mask_svfc, normalize_w, tile, use_pallas,
                                    gt=gt)
    return (ce, neg, topk), (emb, w, labels, gt, logz, topk)


def _vjp_bwd(loss_type, margin, scale, hard_neg, mask_svfc, normalize_w, tile,
             use_pallas, grad_w, res, cotangents):
    emb, w, labels, gt, logz, topk = res
    d_ce, d_neg, _d_topk = cotangents  # topk is a monitoring output: no grad
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        d_emb, d_w = pallas_margin_ce_bwd(
            emb, w, labels, gt, logz, topk, d_ce, d_neg,
            loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
            mask_svfc=mask_svfc, normalize_w=normalize_w, tile=tile, grad_w=grad_w,
        )
    else:
        d_emb, d_w = _stream_bwd(
            emb, w, labels, gt, logz, topk, d_ce, d_neg,
            loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
            mask_svfc=mask_svfc, normalize_w=normalize_w, tile=tile, grad_w=grad_w,
        )
    if d_w is None:
        # free-to-fold broadcast zero; JAX drops it when w isn't differentiated
        d_w = jnp.zeros_like(w)
    return d_emb, d_w, None


fused_margin_softmax.defvjp(_vjp_fwd, _vjp_bwd)


def fused_add_margin(cos_weights_emb, w, labels, *, loss_type="Arc", margin=0.5,
                     scale=32.0, hard_neg=10, mask_svfc=1.2, normalize_w=True,
                     tile=512, use_pallas="auto", grad_w=True):
    """Scalar loss = mean CE over positives + mean hard-neg over outliers —
    the exact reduction of reference ffc.py:60-138 / ops.margin.add_margin,
    but streaming over the class axis."""
    ce, neg, _topk = fused_margin_softmax(
        cos_weights_emb, w, labels, loss_type, margin, scale, hard_neg, mask_svfc,
        normalize_w, tile, use_pallas, grad_w,
    )
    pos = (labels >= 0).astype(jnp.float32)
    n_pos = jnp.sum(pos)
    n_out = jnp.sum(1.0 - pos)
    cls = jnp.where(n_pos > 0, jnp.sum(ce) / jnp.maximum(n_pos, 1.0), 0.0)
    neg_l = jnp.where(n_out > 0, jnp.sum(neg) / jnp.maximum(n_out, 1.0), 0.0)
    return cls + neg_l


# ======================================================================
# sparse d_w backward: truncated top-M-tile classifier gradient
# ======================================================================
#
# The dense streaming backward's HBM floor is the [C, D] d_w store (plus the
# dense optimizer re-reading it): 2 GB written + 12 GB of SGD-momentum
# traffic per step at C=1M. But the margin-CE gradient is effectively
# low-rank: per column j, |d_w_j| ∝ p_j (softmax mass) except at target and
# top-k columns. This path keeps the FORWARD exact (full logsumexp) and
# truncates only d_w/d_emb to the M most relevant class tiles:
#
#   * every target tile (forced — the −δ_target term is O(1));
#   * every tile holding a top-k outlier column (the hard-neg term);
#   * then the highest softmax-mass tiles by the per-tile bound
#     max_row max_col (z − logz) — the same quantity the dense backward's
#     relevance gate thresholds (see _make_bwd_kernel), made top-M instead
#     of thresholded so the output has a static sparse shape.
#
# With M ≥ n_tiles the result is exact (tested); at production scale the
# truncation is the Partial-FC approximation (arXiv 2010.05222 shows ~0.1
# of negatives preserves accuracy) — applied to the *gradient only*, which
# is strictly more accurate than sampling the loss itself.


def select_relevant_tiles(maxz, maxcos, logz, topk, labels, m_tiles: int, tile: int,
                          key=None, random_frac: float = 0.5):
    """Pick the ``m_tiles`` class tiles whose d_w can matter this step.

    ``maxz``/``maxcos`` [n_tiles, B] come from the stats-emitting forward;
    returns distinct tile indices [m_tiles] int32 (top-k of a score, so no
    duplicates). Target tiles are force-included via a scatter-max; tiles
    holding top-k outlier columns get the next-highest boost.

    ``key`` enables RANDOM tile fill: ~``random_frac`` of the budget goes to
    uniformly random tiles each step. Without it, selection in the diffuse
    (early-training) regime is quasi-deterministic — relevance scores all
    tie, top_k breaks ties by index, and most classes never receive
    negative-push gradient.

    Returns (idx [M] int32 distinct, weight [M] f32): the IMPORTANCE weight
    each selected tile's d_w must be scaled by. Tiles with provable gradient
    mass (targets, top-k holders, rel > the dense backward's −20 gate) are
    deterministic picks — weight 1. The rest are a random/arbitrary SAMPLE
    of the below-threshold tiles, whose individually-tiny gradients sum to
    the force that spreads classifier rows apart; they get weight
    (#below-threshold tiles)/(#sampled ones) so the EXPECTED update matches
    dense. This mirrors what Partial-FC does implicitly (its sampled
    denominator inflates p by ~C/S); without it the study
    (tools/sparse_grad_study.py, docs/PERF.md) measured the classifier's
    negative dynamics starving — any truncation collapsed verification
    accuracy to chance while rate 1.0 matched dense exactly.
    """
    n_tiles = maxz.shape[0]
    pos = labels >= 0
    kth = topk[:, -1]
    # per-tile upper bound on log softmax mass: max_row (max_col z − logz)
    rel = jnp.max(maxz - logz[None, :], axis=1)
    topk_hit = jnp.any(
        (maxcos >= kth[None, :] - KTH_TIE_TOL) & (maxcos > 0.0) & (~pos)[None, :], axis=1
    )
    score = rel + jnp.where(topk_hit, jnp.float32(1e6), jnp.float32(0.0))
    if key is not None and random_frac > 0.0:
        # expected random_frac·m boosted tiles; boosted > any mass score but
        # < topk/target boosts, so guarantees still hold
        p = jnp.float32(random_frac * m_tiles / max(n_tiles, 1))
        boost = jax.random.uniform(key, (n_tiles,)) < p
        score = jnp.where(boost, score + jnp.float32(1e4), score)
    tgt_tiles = jnp.where(pos, labels.astype(jnp.int32) // tile, 0)
    score = score.at[tgt_tiles].max(
        jnp.where(pos, jnp.float32(1e9), jnp.float32(-jnp.inf))
    )
    _, idx = jax.lax.top_k(score, m_tiles)
    idx = idx.astype(jnp.int32)
    # STRATIFIED importance weights. Forced picks (targets 1e9, top-k
    # holders ≥1e6) get weight 1. The rest of the population splits into
    # above-gate (rel > −20: provable softmax mass — in the diffuse phase
    # this is EVERY tile) and below-gate strata; each selected tile is
    # weighted by its stratum's population/selected ratio so the EXPECTED
    # total d_w matches dense. The random boost doubles as the randomizer
    # that makes the within-stratum selection ~uniform. (A first version
    # classified all above-gate tiles as deterministic weight-1 picks —
    # which silently disabled compensation in the diffuse phase, where all
    # tiles pass the gate; the accuracy study caught it.)
    forced = score >= jnp.float32(1e6)
    above = (rel > jnp.float32(-20.0)) & ~forced
    below = ~above & ~forced
    sel_forced = forced[idx]
    sel_above = above[idx]
    sel_below = below[idx]
    f32 = jnp.float32
    w_above = jnp.sum(above).astype(f32) / jnp.maximum(jnp.sum(sel_above), 1).astype(f32)
    w_below = jnp.sum(below).astype(f32) / jnp.maximum(jnp.sum(sel_below), 1).astype(f32)
    # a stratum that fits entirely inside the selection has ratio ≤ 1 by
    # construction (never inflate deterministic coverage)
    weight = jnp.where(sel_forced, 1.0,
                       jnp.where(sel_above, jnp.maximum(w_above, 1.0),
                                 jnp.maximum(w_below, 1.0)))
    return idx, weight


def _sparse_tail(emb32, w, labels, gt, tile_idx, d_gt_col, d_w_rows, *, tile,
                 loss_type, margin, normalize_w):
    """Shared post-processing: route the gt-gather path (φ'(gt) into the
    label rows) INTO the sparse rows structure, so row indices stay unique
    (targets' tiles are force-selected, so every label row is present)."""
    pos = labels >= 0
    d_gt = d_gt_col * _phi_prime(gt, loss_type, margin)
    safe = jnp.maximum(labels, 0)
    wl = w[safe].astype(jnp.float32)
    wln = _normalize_rows(wl) if normalize_w else wl
    pos1 = pos.astype(jnp.float32)[:, None]
    d_emb_extra = d_gt[:, None] * wln * pos1
    d_wln = d_gt[:, None] * emb32 * pos1
    if normalize_w:
        n2 = jnp.maximum(jnp.sum(wl * wl, axis=-1, keepdims=True), 1e-24)
        inv = jax.lax.rsqrt(n2)
        d_wl = inv * (d_wln - wln * jnp.sum(d_wln * wln, axis=-1, keepdims=True))
    else:
        d_wl = d_wln
    # position of each label row inside the selected-tiles flat layout
    lbl_tile = safe.astype(jnp.int32) // tile
    match = tile_idx[None, :] == lbl_tile[:, None]  # [B, M]
    m_of = jnp.argmax(match, axis=1)
    present = jnp.any(match, axis=1) & pos
    flat_pos = m_of * tile + safe.astype(jnp.int32) % tile
    d_w_rows = d_w_rows.at[flat_pos].add(
        jnp.where(present[:, None], d_wl, 0.0), mode="drop"
    )
    return d_emb_extra, d_w_rows


def _sparse_bwd_gather(emb, w, labels, gt, logz, topk, d_ce, d_neg, tile_idx, *,
                       loss_type, margin, scale, k, mask_svfc, normalize_w, tile):
    """XLA reference implementation of the sparse backward (any backend):
    gather the selected tiles, one dense [B, M·tile] pass."""
    b, d = emb.shape
    c = w.shape[0]
    m = tile_idx.shape[0]
    emb32 = emb.astype(jnp.float32)
    wp, n_tiles = _pad_classes(w, c, tile)
    w_sel = wp.reshape(n_tiles, tile, d)[tile_idx].reshape(m * tile, d)
    col = (tile_idx[:, None] * tile + jnp.arange(tile, dtype=jnp.int32)[None, :]).reshape(-1)
    wn = _normalize_rows(w_sel) if normalize_w else w_sel.astype(jnp.float32)
    cos = emb32 @ wn.T  # [B, M·tile]
    valid = (col < c)[None, :]
    cos_v = jnp.where(valid, cos, NEG_INF)
    is_target = col[None, :] == labels[:, None]
    pos = (labels >= 0)[:, None]
    d_ce = jnp.where(labels >= 0, d_ce, 0.0)
    d_neg = jnp.where(labels >= 0, 0.0, d_neg)
    gt_col = gt[:, None]
    mod = _tile_modified(cos_v, is_target, gt_col, valid, loss_type, margin, mask_svfc)
    p = jnp.exp(scale * mod - logz[:, None])
    dz = (p - is_target.astype(jnp.float32)) * d_ce[:, None] * scale
    if loss_type == "SV":
        hard = cos_v > (gt_col - margin)
        col_fac = jnp.where(hard & ~is_target, mask_svfc, 1.0)
    else:
        col_fac = 1.0
    d_cos = jnp.where(is_target, 0.0, dz * col_fac)
    d_gt_col = jnp.sum(jnp.where(is_target, dz, 0.0), axis=-1)
    kth = topk[:, -1][:, None]
    in_topk = (cos_v >= kth - KTH_TIE_TOL) & (cos_v > 0) & ~pos
    d_cos = d_cos + jnp.where(in_topk, d_neg[:, None] / k, 0.0)
    d_cos = jnp.where(valid, d_cos, 0.0)
    d_emb = d_cos @ wn
    d_wn = d_cos.T @ emb32  # [M·tile, D]
    if normalize_w:
        w32 = w_sel.astype(jnp.float32)
        n2 = jnp.maximum(jnp.sum(w32 * w32, axis=-1, keepdims=True), 1e-24)
        inv = jax.lax.rsqrt(n2)
        d_w_rows = inv * (d_wn - wn * jnp.sum(d_wn * wn, axis=-1, keepdims=True))
    else:
        d_w_rows = d_wn
    d_emb_extra, d_w_rows = _sparse_tail(
        emb32, w, labels, gt, tile_idx, d_gt_col, d_w_rows,
        tile=tile, loss_type=loss_type, margin=margin, normalize_w=normalize_w,
    )
    return (d_emb + d_emb_extra).astype(emb.dtype), d_w_rows


def _make_sparse_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc,
                            normalize_w, mxu_bf16=False):
    def kernel(idx_ref, labels_ref, gt_ref, logz_ref, kth_ref, dce_ref, dneg_ref,
               emb_ref, w_ref,
               dw_ref, demb_ref, dgt_ref,
               demb_scr, dgt_scr):
        i = pl.program_id(0)
        n_i = pl.num_programs(0)

        @pl.when(i == 0)
        def _init():
            demb_scr[:] = jnp.zeros((b, d), jnp.float32)
            dgt_scr[:] = jnp.zeros((b, 1), jnp.float32)

        t = idx_ref[i]  # the real class-tile index (scalar prefetch)
        labels = labels_ref[:]
        gt = gt_ref[:]
        logz = logz_ref[:]
        kth = kth_ref[:]
        d_ce = dce_ref[:]
        d_neg = dneg_ref[:]
        pos = labels >= 0

        emb = emb_ref[:].astype(jnp.float32)
        w_tile = w_ref[:].astype(jnp.float32)
        if normalize_w:
            n2 = jnp.maximum(jnp.sum(w_tile * w_tile, axis=-1, keepdims=True), 1e-24)
            inv = jax.lax.rsqrt(n2)
            wn = w_tile * inv
        else:
            inv = None
            wn = w_tile
        e_op, wn_op = _mxu_pair(emb, wn, mxu_bf16)
        cos = jnp.dot(e_op, wn_op.T, preferred_element_type=jnp.float32)
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cos_v = jnp.where(valid, cos, NEG_INF)
        is_target = col == labels
        mod = _tile_modified(cos_v, is_target, gt, valid, loss_type, margin, mask_svfc)
        p = jnp.exp(scale * mod - logz)
        dz = (p - is_target.astype(jnp.float32)) * d_ce * scale
        if loss_type == "SV":
            hard = cos_v > (gt - margin)
            col_fac = jnp.where(hard & ~is_target, mask_svfc, 1.0)
        else:
            col_fac = 1.0
        d_cos = jnp.where(is_target, 0.0, dz * col_fac)
        dgt_scr[:] = dgt_scr[:] + jnp.sum(
            jnp.where(is_target, dz, 0.0), axis=-1, keepdims=True
        )
        in_topk = (cos_v >= kth - KTH_TIE_TOL) & (cos_v > 0) & jnp.logical_not(pos)
        d_cos2 = d_cos + jnp.where(in_topk, d_neg / k, 0.0)
        d_cos2 = jnp.where(valid, d_cos2, 0.0)
        dc_op, _ = _mxu_pair(d_cos2, d_cos2, mxu_bf16)
        demb_scr[:] = demb_scr[:] + jnp.dot(dc_op, wn_op, preferred_element_type=jnp.float32)
        d_wn = jnp.dot(dc_op.T, e_op, preferred_element_type=jnp.float32)
        if normalize_w:
            dw_ref[:] = inv * (d_wn - wn * jnp.sum(d_wn * wn, axis=-1, keepdims=True))
        else:
            dw_ref[:] = d_wn

        @pl.when(i == n_i - 1)
        def _finalize():
            demb_ref[:] = demb_scr[:]
            dgt_ref[:] = dgt_scr[:]

    return kernel


def pallas_margin_ce_bwd_sparse(emb, w, labels, gt, logz, topk, d_ce, d_neg,
                                tile_idx, *, loss_type, margin, scale, k, mask_svfc,
                                normalize_w, tile, interpret=False):
    """Sparse Pallas backward: grid over the M SELECTED tiles only; the tile
    index arrives via scalar prefetch so each step DMAs just its own w tile.
    HBM traffic is O(M·tile·D) instead of O(C·D) read + O(C·D) write."""
    b, d = emb.shape
    c = w.shape[0]
    m = tile_idx.shape[0]
    wp, n_tiles = _pad_classes(w, c, tile)
    kernel = _make_sparse_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                                     mask_svfc, normalize_w,
                                     mxu_bf16=w.dtype == jnp.bfloat16)
    pos = labels >= 0
    d_ce = jnp.where(pos, d_ce, 0.0).astype(jnp.float32)
    d_neg = jnp.where(pos, 0.0, d_neg).astype(jnp.float32)
    kth = topk[:, -1]
    vec = lambda v: v[:, None].astype(jnp.float32)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, idx: (idx[i], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i, idx: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
    )
    dw_rows, d_emb, d_gt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m * tile, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(tile_idx, labels.astype(jnp.int32)[:, None], vec(gt), vec(logz), vec(kth),
      vec(d_ce), vec(d_neg), emb.astype(jnp.float32), wp)
    emb32 = emb.astype(jnp.float32)
    d_emb_extra, dw_rows = _sparse_tail(
        emb32, w, labels, gt, tile_idx, d_gt[:, 0], dw_rows,
        tile=tile, loss_type=loss_type, margin=margin, normalize_w=normalize_w,
    )
    return (d_emb + d_emb_extra).astype(emb.dtype), dw_rows


def streaming_sparse_margin_grads(
    emb, w, labels, d_ce, d_neg, *, m_tiles, loss_type="Arc", margin=0.5,
    scale=32.0, hard_neg=1, mask_svfc=1.2, normalize_w=True, tile=512,
    use_pallas="auto", key=None, random_frac: float = 0.5, exact_demb=True,
):
    """One explicit fwd+bwd with a SPARSE classifier gradient.

    Not a custom_vjp — ``jax.grad`` requires a dense [C, D] cotangent for
    ``w``, which is exactly the HBM traffic this path exists to avoid. The
    caller supplies the output cotangents (``d_ce``/``d_neg`` [B], known
    analytically for mean reductions), feeds ``d_emb`` into the backbone via
    ``jax.vjp``, and applies (row_idx, d_w_rows) with a sparse row optimizer
    (train/sparse_classifier.py).

    Returns (ce, neg, topk, gt, d_emb, row_idx [M·tile], d_w_rows [M·tile, D]).
    ``row_idx`` entries are unique; entries ≥ C are padding — scatter with
    ``mode='drop'`` (train/sparse_classifier.py does). The forward/loss is
    EXACT. With ``exact_demb`` (the default), ``d_emb`` is ALSO exact — only
    the CLASSIFIER gradient is truncated to the selected rows, i.e. exactly
    Partial-FC's update semantics with mass-directed instead of purely
    random row choice. This matters: the accuracy study
    (tools/sparse_grad_study.py, docs/PERF.md) showed that truncating
    d_emb too drops most of the negative-push signal early in training and
    the embeddings collapse (loss falls, verification accuracy doesn't).
    The extra cost is one more streaming read of ``w`` (no [C, D] write —
    the expensive part stays dead); ``exact_demb=False`` keeps the fully
    truncated backward for the converged/fine-tuning regime.
    ``gt`` (target cosines) is returned for free so callers can derive
    top-1 accuracy against ``topk[:, 0]``.
    """
    c = w.shape[0]
    b, d = emb.shape
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    tile, n_tiles = sparse_bwd_geometry(b, d, c, tile)
    m_tiles = min(m_tiles, n_tiles)
    gt = compute_gt(emb, w, labels, normalize_w)
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
              mask_svfc=mask_svfc, normalize_w=normalize_w, tile=tile)
    fwd = pallas_margin_ce_fwd if use_pallas else _stream_fwd
    ce, neg, logz, topk, maxz, maxcos = fwd(
        emb, w, labels, gt, with_stats=True, **kw
    )
    tile_idx, tile_weight = select_relevant_tiles(
        maxz, maxcos, logz, topk, labels, m_tiles, tile,
        key=key, random_frac=random_frac,
    )
    bwd_sparse = pallas_margin_ce_bwd_sparse if use_pallas else _sparse_bwd_gather
    d_emb_trunc, d_w_rows = bwd_sparse(
        emb, w, labels, gt, logz, topk, d_ce, d_neg, tile_idx, **kw
    )
    # importance weights: sampled-coverage tiles scaled so E[update] matches
    # dense (see select_relevant_tiles); deterministic tiles unchanged
    d_w_rows = d_w_rows * jnp.repeat(tile_weight, tile)[:, None]
    if exact_demb:
        bwd_full = pallas_margin_ce_bwd if use_pallas else _stream_bwd
        d_emb, _ = bwd_full(emb, w, labels, gt, logz, topk, d_ce, d_neg,
                            grad_w=False, **kw)
    else:
        d_emb = d_emb_trunc
    row_idx = (
        tile_idx[:, None] * tile + jnp.arange(tile, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    return ce, neg, topk, gt, d_emb, row_idx, d_w_rows


def sparse_bwd_geometry(b: int, d: int, c: int, tile: int = 512) -> tuple[int, int]:
    """(clamped_tile, n_tiles) as the sparse/dense backward kernels use —
    lets callers size ``m_tiles`` (e.g. rate × n_tiles) consistently."""
    max_tile = max(256, int((11 * 2**20) // (16 * d + 24 * b)) // 128 * 128)
    tile = min(tile, max_tile)
    return tile, (c + tile - 1) // tile
