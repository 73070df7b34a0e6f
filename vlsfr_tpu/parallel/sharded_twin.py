"""Sharded twin-view FFC head: the multi-chip multi-million-slot DCP path.

The single-shard twin kernel (ops/twin_margin.py) fuses one FFC direction's
entire head — this step's queue writes applied in-register, the parity
blend rebuilt per column, both views' margin-CE streamed together — so the
queue is read once per pass with no scattered copy and no blended [Q, D]
copy. This module lifts that composition onto a device mesh
(reference ffc.py:180-202 semantics; BASELINE config 5 scale):

* queue [2, Q, D] split row-wise over the mesh ``model`` axis (spec
  P(None, "model", None)) — each shard holds [2, Q/m, D] and passes its
  FULL local block to the Pallas kernels (plane-0 tiles stream through a
  leading BlockSpec dim; plane 1 is only ever a B-row gather — slicing a
  plane at a custom-call site would materialize a [Q/m, D] copy);
* the write plan (g, rows, cols, seen) is replicated — every shard applies
  the writes that land in its slot range in-register (writes are localized
  to shard coordinates; out-of-shard writes get column -1, which never
  matches a local column);
* per shard, the twin PARTIAL kernels (ops/twin_margin.py
  pallas_twin_partial_fwd/bwd) stream the local tiles emitting the raw
  online-softmax state (m, s, topk) per view / the local d_emb partial;
  on non-TPU backends the `lax.scan` bodies in parallel/_shard_common.py
  compute the same partials (the CPU-mesh test fallback — selected by
  backend);
* the per-view partials merge with ``pmax``/``psum`` over "model"; the
  hard-negative top-k merges with ``all_gather`` + ``top_k``;
* the backward re-streams local tiles against the global (logz, gt, kth)
  and returns a LOCAL d_emb partial — shard_map's transpose psums it over
  "model". The queue is a stop-gradient constant (no d_w at all);
* queue row 1 is NEVER streamed: view 2 differs from view 1 only at this
  step's ≤B written slots, so its values come from a B-row gather of q1
  plus the write plan (``shard_write_values``) — per direction each shard
  reads its q0 rows once forward + once backward and exactly B rows of q1.

bf16 queues select the bf16 MXU path inside the kernels AND the scan body
(``_mxu_pair``): the dots run at the MXU's native bf16 rate with f32
accumulate, same as the single-shard ladder.

NOTE: the FFC train step streams BOTH directions in one pass via
parallel/sharded_quad.py (the sharded quad); this per-direction
composition remains the building block and the
``directional_loss``-compatible surface.

Loss/grad parity with the single-shard twin op is tested on the 8-device
CPU mesh in tests/test_sharded_twin.py (scan), and scan==pallas per-shard
equivalence via interpret mode in tests/test_sharded_twin_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vlsfr_tpu.ops.margin_pallas import (
    KTH_TIE_TOL,
    _phi_prime,
    _phi_target,
)
from vlsfr_tpu.ops.twin_margin import (
    pallas_twin_partial_bwd,
    pallas_twin_partial_fwd,
    reduce_margin_dir,
)
from vlsfr_tpu.parallel._shard_common import (
    AXIS,
    carriers,
    collective_merge,
    localize,
    effective_label_rows,
    scan_bwd,
    scan_partials,
    shard_gts,
    shard_write_values,
)


def make_sharded_twin_loss(mesh, *, loss_type="Arc", margin=0.5, scale=32.0,
                           hard_neg=10, mask_svfc=1.2, tile=512,
                           data_axis="data", use_pallas="auto",
                           interpret=False, with_acc=False):
    """Returns loss_fn(emb, queue, g, rows, cols, seen, labels) -> loss.

    emb [B, D] P(data, None); queue [2, Q, D] P(None, model, None) (Q
    divisible by the model-axis size); g [B, D], rows/cols/seen [B]
    replicated write plan; labels [B] P(data) — global slot ids or -1 for
    outliers. Differentiable w.r.t. ``emb`` only (queue and gallery
    embeddings are stop-gradient constants in FFC). The scalar reduction
    matches ops/twin_margin.twin_add_margin.

    ``use_pallas``: "auto" routes per-shard streams through the Pallas
    partial kernels on TPU and the scan body elsewhere; True/False force.
    """
    k = hard_neg
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=k,
              mask_svfc=mask_svfc, tile=tile)

    @jax.custom_vjp
    def shard_loss(emb_l, q_l, g, rows, cols, seen, labels_l):
        out, _ = _shard_fwd(emb_l, q_l, g, rows, cols, seen, labels_l)
        return out

    def _shard_fwd(emb_l, q_l, g, rows, cols, seen, labels_l):
        mxu_bf16 = q_l.dtype == jnp.bfloat16
        emb32 = emb_l.astype(jnp.float32)
        g32, rows_i, cols_i, seen_f = carriers(g, rows, cols, seen)
        _, c_local, lcol, in_range, ll, owned = localize(q_l, cols_i, labels_l)
        gt1, gt2, _, _ = shard_gts(emb32, q_l, g32, rows_i, cols_i, seen_f,
                                   labels_l, owned, ll)
        v, blend_b = shard_write_values(q_l, g32, rows_i, cols_i, seen_f,
                                        lcol, in_range)

        if use_pallas:
            p1, p2 = pallas_twin_partial_fwd(
                emb32, q_l, v, blend_b, g32, rows_i, lcol, ll, gt1, gt2,
                interpret=interpret, mxu_bf16=mxu_bf16, **kw)
        else:
            p1, p2 = scan_partials(emb32, q_l, g32, rows_i, lcol, v, blend_b,
                                   ll, gt1, gt2, c_local, mxu_bf16, **kw)
        (m1, s1, t1), (m2, s2, t2) = p1, p2

        pos = labels_l >= 0

        def merge(m_l, s_l, topk_l, gt):
            logz, topk = collective_merge(m_l, s_l, topk_l, k)
            phi = _phi_target(gt, loss_type, margin, mask_svfc)
            ce = jnp.where(pos, logz - scale * phi, 0.0)
            neg = jnp.where(pos, 0.0, jnp.mean(jnp.maximum(topk, 0.0), axis=-1))
            return ce, neg, logz, topk

        ce1, neg1, logz1, topk1 = merge(m1, s1, t1, gt1)
        ce2, neg2, logz2, topk2 = merge(m2, s2, t2, gt2)
        # streaming top-1 hit per row (view 1, global top-k) — the sharded
        # twin train accuracy (ops/twin_margin._twin_fwd_impl)
        hit1 = ((gt1 + KTH_TIE_TOL >= topk1[:, 0]) & pos).astype(jnp.float32)
        return ((ce1, neg1, ce2, neg2, hit1),
                (emb_l, q_l, g, rows, cols, seen, labels_l,
                 gt1, gt2, logz1, logz2, topk1, topk2))

    def _shard_bwd(res, cots):
        (emb_l, q_l, g, rows, cols, seen, labels_l,
         gt1, gt2, logz1, logz2, topk1, topk2) = res
        d_ce1, d_neg1, d_ce2, d_neg2, _d_hit = cots
        mxu_bf16 = q_l.dtype == jnp.bfloat16
        emb32 = emb_l.astype(jnp.float32)
        g32, rows_i, cols_i, seen_f = carriers(g, rows, cols, seen)
        _, c_local, lcol, in_range, ll, owned = localize(q_l, cols_i, labels_l)
        pos = labels_l >= 0
        # replicated-over-model outputs: shard_map's transpose splits their
        # cotangents across the model shards — reassemble, then return LOCAL
        # partials and let the transpose psum d_emb over "model"
        # (same contract as parallel/sharded_margin.py).
        d_ce1 = jnp.where(pos, jax.lax.psum(d_ce1, AXIS), 0.0)
        d_ce2 = jnp.where(pos, jax.lax.psum(d_ce2, AXIS), 0.0)
        d_neg1 = jnp.where(pos, 0.0, jax.lax.psum(d_neg1, AXIS))
        d_neg2 = jnp.where(pos, 0.0, jax.lax.psum(d_neg2, AXIS))
        kth1 = topk1[:, -1]
        kth2 = topk2[:, -1]
        v, blend_b = shard_write_values(q_l, g32, rows_i, cols_i, seen_f,
                                        lcol, in_range)

        if use_pallas:
            d_emb, dgt1, dgt2 = pallas_twin_partial_bwd(
                emb32, q_l, v, blend_b, g32, rows_i, lcol, ll, gt1, gt2,
                logz1, logz2, kth1, kth2, (d_ce1, d_neg1), (d_ce2, d_neg2),
                interpret=interpret, mxu_bf16=mxu_bf16, **kw)
        else:
            d_emb, dgt1, dgt2 = scan_bwd(
                emb32, q_l, g32, rows_i, lcol, v, blend_b, ll, pos, gt1, gt2,
                logz1, logz2, kth1, kth2, d_ce1, d_neg1, d_ce2, d_neg2,
                c_local, mxu_bf16, **kw)

        # φ'(gt) routing through the effective label rows (owner shard only;
        # d_emb's model-psum in the transpose completes it) — the sharded
        # _twin_gt_tail (ops/twin_margin.py).
        dgt1 = jax.lax.psum(dgt1, AXIS) * _phi_prime(gt1, loss_type, margin)
        dgt2 = jax.lax.psum(dgt2, AXIS) * _phi_prime(gt2, loss_type, margin)
        # collective-free: gts come from residuals, so only the effective
        # rows are needed here (shard_gts would re-psum gt1/gt2 for nothing)
        r0e, rbe = effective_label_rows(q_l, g32, rows_i, cols_i, seen_f,
                                        labels_l, owned, ll)
        own1 = (owned & pos).astype(jnp.float32)[:, None]
        d_emb = d_emb + dgt1[:, None] * r0e * own1
        d_emb = d_emb + dgt2[:, None] * rbe * own1
        return (d_emb.astype(emb_l.dtype), jnp.zeros_like(q_l),
                jnp.zeros_like(g), None, None, None, None)

    def _fwd_rule(emb_l, q_l, g, rows, cols, seen, labels_l):
        return _shard_fwd(emb_l, q_l, g, rows, cols, seen, labels_l)

    shard_loss.defvjp(_fwd_rule, _shard_bwd)

    inner = jax.shard_map(
        shard_loss,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(None, AXIS, None),
                  P(None, None), P(None), P(None), P(None), P(data_axis)),
        out_specs=(P(data_axis),) * 5,
        check_vma=False,
    )

    def loss_fn(emb, queue, g, rows, cols, seen, labels):
        ce1, neg1, ce2, neg2, hit1 = inner(emb, queue, jax.lax.stop_gradient(g),
                                           rows, cols, seen, labels)
        loss = reduce_margin_dir(ce1, neg1, ce2, neg2, labels)
        if with_acc:
            n_pos = jnp.maximum(jnp.sum((labels >= 0).astype(jnp.float32)),
                                1.0)
            return loss, jnp.sum(hit1) / n_pos
        return loss

    return loss_fn
