"""Sharded QUAD FFC head: both directions in ONE pass over the sharded queue.

The FFC step computes two directional losses against the SAME pre-update
queue (core/ffc.py rollback-free double pass). Composed as two sharded twin
calls (parallel/sharded_twin.py) that is 4 streaming passes over each
queue shard per step — and the streams are HBM-bound, so the local queue
bytes ARE the per-chip cost, exactly as on one chip. This module is the
mesh lift of the single-shard quad kernels (ops/twin_margin.py): per
shard, ONE Pallas pass advances all four view streams (2 directions × 2
views) per local q0 tile — 2 passes per step over each shard instead
of 4.

Per-shard semantics match the sharded twin composition (localized write
plans/labels, global gt via psum, collective logsumexp/top-k merges, local
d_emb partials psum'd by shard_map's transpose). Two extra wrinkles:

* Arc/AM run the shared-stream bodies: the per-shard partial state is the
  NEGATIVE-columns logsumexp (target excluded on its owner shard); after
  the collective merge the composition adds each view's target term
  analytically — logz_v = logaddexp(logz_neg_v, scale·φ(gt_v)) — the
  same finalize the single-shard shared kernels apply in-kernel. SV keeps
  the two-stream bodies (per-view φ/mask application) and the twin-style
  merge.
* the backward's dgt comes back as raw owner-shard values in BOTH modes
  (Arc/AM analytic-on-owner, SV accumulated) — one psum recovers the
  global dgt.

Equivalence with two single-shard twin calls is tested on the 8-device
CPU mesh in tests/test_sharded_quad.py (scan + interpret-Pallas).
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
    _zero_cot,
    pallas_quad_partial_bwd,
    pallas_quad_partial_fwd,
    reduce_margin_dir,
)
from vlsfr_tpu.parallel._shard_common import (
    AXIS,
    carriers,
    collective_merge,
    effective_label_rows,
    localize,
    scan_bwd,
    scan_partials,
    shard_gts,
    shard_write_values,
)


def make_sharded_quad_loss(mesh, *, loss_type="Arc", margin=0.5, scale=32.0,
                           hard_neg=10, mask_svfc=1.2, tile=512,
                           data_axis="data", use_pallas="auto",
                           interpret=False, with_acc=False,
                           int8_compute=False):
    """Returns loss_fn(emb_x, emb_y, queue, g_a, g_b, plan_a, plan_b,
    labels_a, labels_b) -> (loss_a, loss_b) [, acc].

    emb_x/emb_y [B, D] P(data, None); queue [2, Q, D] P(None, model, None);
    g_a/g_b [B, D] + plan_* = (rows, cols, seen) replicated; labels_*
    P(data). Differentiable w.r.t. emb_x/emb_y only. Reductions match
    ops/twin_margin.quad_add_margin per direction.

    ``int8_compute`` (int8 queues + the Pallas partial kernels only):
    quantize each shard's local probe rows and run the clean-tile streamed
    dots int8×int8→int32 on the MXU — per-row quantization is
    shard-independent, so the mode matches the single-shard
    quad_add_margin(int8_compute=True) path. The scan fallback ignores
    the flag (it computes on dequantized rows), mirroring single-shard."""
    k = hard_neg
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    # Arc/AM Pallas runs the shared NEGATIVE-stream bodies → analytic
    # target finalize at merge; SV (and the scan fallback) streams the
    # target column in-band via φ(gt)
    analytic_target = use_pallas and loss_type != "SV"
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=k,
              mask_svfc=mask_svfc, tile=tile)

    def _dir_pack(emb32, q_l, g, rows, cols, seen, labels_l, *, gts=True,
                  qs_l=None):
        """Localized carrier pack for one direction. ``gts=False`` (the
        backward, which reads gt1/gt2 from residuals) skips shard_gts's two
        psum collectives and computes only the effective label rows.
        ``qs_l`` is the shard's [2, Q/m] dequant scales for int8 queues."""
        g32, rows_i, cols_i, seen_f = carriers(g, rows, cols, seen)
        _, c_local, lcol, in_range, ll, owned = localize(q_l, cols_i, labels_l)
        if gts:
            gt1, gt2, r0e, rbe = shard_gts(emb32, q_l, g32, rows_i, cols_i,
                                           seen_f, labels_l, owned, ll,
                                           qs_l=qs_l)
        else:
            gt1 = gt2 = None
            r0e, rbe = effective_label_rows(q_l, g32, rows_i, cols_i, seen_f,
                                            labels_l, owned, ll, qs_l=qs_l)
        v, blend_b = shard_write_values(q_l, g32, rows_i, cols_i, seen_f,
                                        lcol, in_range, qs_l=qs_l)
        return dict(g32=g32, rows_i=rows_i, cols_i=cols_i, seen_f=seen_f,
                    lcol=lcol, ll=ll, owned=owned, gt1=gt1, gt2=gt2,
                    r0e=r0e, rbe=rbe, v=v, blend_b=blend_b, c_local=c_local)

    def _merge_dir(partials, pk, labels_l):
        """Collective merge of one direction's two view streams."""
        pos = labels_l >= 0
        outs = []
        for (m_l, s_l, t_l), gt in zip(partials, (pk["gt1"], pk["gt2"])):
            logz_raw, topk = collective_merge(m_l, s_l, t_l, k)
            zt = scale * _phi_target(gt, loss_type, margin, mask_svfc)
            if analytic_target:
                m_f = jnp.maximum(logz_raw, zt)
                logz_pos = m_f + jnp.log(jnp.exp(logz_raw - m_f)
                                         + jnp.exp(zt - m_f))
                logz = jnp.where(pos, logz_pos, logz_raw)
            else:
                logz = logz_raw
            ce = jnp.where(pos, logz - zt, 0.0)
            neg = jnp.where(pos, 0.0, jnp.mean(jnp.maximum(topk, 0.0), axis=-1))
            outs.append((ce, neg, logz, topk))
        return outs

    def _shard_fwd(emb_x, emb_y, q_l, g_a, g_b, rowsA, colsA, seenA,
                   rowsB, colsB, seenB, labA, labB, qs_l=None):
        mxu_bf16 = q_l.dtype == jnp.bfloat16
        ex32 = emb_x.astype(jnp.float32)
        ey32 = emb_y.astype(jnp.float32)
        pa = _dir_pack(ex32, q_l, g_a, rowsA, colsA, seenA, labA, qs_l=qs_l)
        pb = _dir_pack(ey32, q_l, g_b, rowsB, colsB, seenB, labB, qs_l=qs_l)

        if use_pallas:
            dir_a = (pa["g32"], pa["rows_i"], pa["lcol"], pa["v"],
                     pa["blend_b"], pa["ll"], pa["gt1"], pa["gt2"])
            dir_b = (pb["g32"], pb["rows_i"], pb["lcol"], pb["v"],
                     pb["blend_b"], pb["ll"], pb["gt1"], pb["gt2"])
            parts_a, parts_b = pallas_quad_partial_fwd(
                ex32, ey32, q_l, dir_a, dir_b, interpret=interpret,
                mxu_bf16=mxu_bf16, qscales=qs_l,
                int8_compute=int8_compute and qs_l is not None, **kw)
        else:
            parts_a = scan_partials(ex32, q_l, pa["g32"], pa["rows_i"],
                                    pa["lcol"], pa["v"], pa["blend_b"],
                                    pa["ll"], pa["gt1"], pa["gt2"],
                                    pa["c_local"], mxu_bf16, qs_l=qs_l, **kw)
            parts_b = scan_partials(ey32, q_l, pb["g32"], pb["rows_i"],
                                    pb["lcol"], pb["v"], pb["blend_b"],
                                    pb["ll"], pb["gt1"], pb["gt2"],
                                    pb["c_local"], mxu_bf16, qs_l=qs_l, **kw)

        (ce1a, neg1a, logz1a, topk1a), (ce2a, neg2a, logz2a, topk2a) = \
            _merge_dir(parts_a, pa, labA)
        (ce1b, neg1b, logz1b, topk1b), (ce2b, neg2b, logz2b, topk2b) = \
            _merge_dir(parts_b, pb, labB)
        hit_a = ((pa["gt1"] + KTH_TIE_TOL >= topk1a[:, 0])
                 & (labA >= 0)).astype(jnp.float32)
        hit_b = ((pb["gt1"] + KTH_TIE_TOL >= topk1b[:, 0])
                 & (labB >= 0)).astype(jnp.float32)
        out = (ce1a, neg1a, ce2a, neg2a, ce1b, neg1b, ce2b, neg2b,
               hit_a, hit_b)
        res = (emb_x, emb_y, q_l, g_a, g_b, rowsA, colsA, seenA,
               rowsB, colsB, seenB, labA, labB,
               (pa["gt1"], pa["gt2"], pb["gt1"], pb["gt2"]),
               (logz1a, logz2a, logz1b, logz2b),
               (topk1a, topk2a, topk1b, topk2b), qs_l)
        return out, res

    def _shard_bwd(res, cots):
        (emb_x, emb_y, q_l, g_a, g_b, rowsA, colsA, seenA,
         rowsB, colsB, seenB, labA, labB, gts, logzs, topks, qs_l) = res
        (d_ce1a, d_neg1a, d_ce2a, d_neg2a,
         d_ce1b, d_neg1b, d_ce2b, d_neg2b, _dh_a, _dh_b) = cots
        mxu_bf16 = q_l.dtype == jnp.bfloat16
        ex32 = emb_x.astype(jnp.float32)
        ey32 = emb_y.astype(jnp.float32)
        pa = _dir_pack(ex32, q_l, g_a, rowsA, colsA, seenA, labA, gts=False,
                       qs_l=qs_l)
        pb = _dir_pack(ey32, q_l, g_b, rowsB, colsB, seenB, labB, gts=False,
                       qs_l=qs_l)
        gt1a, gt2a, gt1b, gt2b = gts
        logz1a, logz2a, logz1b, logz2b = logzs
        topk1a, topk2a, topk1b, topk2b = topks
        posA = labA >= 0
        posB = labB >= 0

        def fix(cot, pos, is_ce):
            cot = jax.lax.psum(cot, AXIS)
            return jnp.where(pos, cot, 0.0) if is_ce else jnp.where(pos, 0.0, cot)

        d_ce1a = fix(d_ce1a, posA, True)
        d_ce2a = fix(d_ce2a, posA, True)
        d_neg1a = fix(d_neg1a, posA, False)
        d_neg2a = fix(d_neg2a, posA, False)
        d_ce1b = fix(d_ce1b, posB, True)
        d_ce2b = fix(d_ce2b, posB, True)
        d_neg1b = fix(d_neg1b, posB, False)
        d_neg2b = fix(d_neg2b, posB, False)

        if use_pallas:
            dir_a = (pa["g32"], pa["rows_i"], pa["lcol"], pa["v"],
                     pa["blend_b"], pa["ll"], gt1a, gt2a)
            dir_b = (pb["g32"], pb["rows_i"], pb["lcol"], pb["v"],
                     pb["blend_b"], pb["ll"], gt1b, gt2b)
            glob_a = (logz1a, logz2a, topk1a[:, -1], topk2a[:, -1],
                      d_ce1a, d_neg1a, d_ce2a, d_neg2a)
            glob_b = (logz1b, logz2b, topk1b[:, -1], topk2b[:, -1],
                      d_ce1b, d_neg1b, d_ce2b, d_neg2b)
            (d_ex, dgt1a, dgt2a, d_ey, dgt1b, dgt2b) = pallas_quad_partial_bwd(
                ex32, ey32, q_l, dir_a, dir_b, glob_a, glob_b,
                interpret=interpret, mxu_bf16=mxu_bf16, qscales=qs_l,
                int8_compute=int8_compute and qs_l is not None, **kw)
        else:
            d_ex, dgt1a, dgt2a = scan_bwd(
                ex32, q_l, pa["g32"], pa["rows_i"], pa["lcol"], pa["v"],
                pa["blend_b"], pa["ll"], posA, gt1a, gt2a, logz1a, logz2a,
                topk1a[:, -1], topk2a[:, -1], d_ce1a, d_neg1a, d_ce2a,
                d_neg2a, pa["c_local"], mxu_bf16, qs_l=qs_l, **kw)
            d_ey, dgt1b, dgt2b = scan_bwd(
                ey32, q_l, pb["g32"], pb["rows_i"], pb["lcol"], pb["v"],
                pb["blend_b"], pb["ll"], posB, gt1b, gt2b, logz1b, logz2b,
                topk1b[:, -1], topk2b[:, -1], d_ce1b, d_neg1b, d_ce2b,
                d_neg2b, pb["c_local"], mxu_bf16, qs_l=qs_l, **kw)

        def gt_tail(d_emb, pk, pos, gt1, gt2, dgt1, dgt2):
            dgt1 = jax.lax.psum(dgt1, AXIS) * _phi_prime(gt1, loss_type, margin)
            dgt2 = jax.lax.psum(dgt2, AXIS) * _phi_prime(gt2, loss_type, margin)
            own1 = (pk["owned"] & pos).astype(jnp.float32)[:, None]
            d_emb = d_emb + dgt1[:, None] * pk["r0e"] * own1
            d_emb = d_emb + dgt2[:, None] * pk["rbe"] * own1
            return d_emb

        d_ex = gt_tail(d_ex, pa, posA, gt1a, gt2a, dgt1a, dgt2a)
        d_ey = gt_tail(d_ey, pb, posB, gt1b, gt2b, dgt1b, dgt2b)
        grads = (d_ex.astype(emb_x.dtype), d_ey.astype(emb_y.dtype),
                 _zero_cot(q_l), jnp.zeros_like(g_a), jnp.zeros_like(g_b),
                 None, None, None, None, None, None, None, None)
        return grads if qs_l is None else grads + (jnp.zeros_like(qs_l),)

    @jax.custom_vjp
    def shard_loss(emb_x, emb_y, q_l, g_a, g_b, rowsA, colsA, seenA,
                   rowsB, colsB, seenB, labA, labB):
        out, _ = _shard_fwd(emb_x, emb_y, q_l, g_a, g_b, rowsA, colsA, seenA,
                            rowsB, colsB, seenB, labA, labB)
        return out

    shard_loss.defvjp(lambda *a: _shard_fwd(*a), _shard_bwd)

    # int8-queue variant: the shard's [2, Q/m] dequant scales ride as the
    # LAST operand (ops/qqueue.py) — the grads tuple grows one zeros entry
    @jax.custom_vjp
    def shard_loss_q(emb_x, emb_y, q_l, g_a, g_b, rowsA, colsA, seenA,
                     rowsB, colsB, seenB, labA, labB, qs_l):
        out, _ = _shard_fwd(emb_x, emb_y, q_l, g_a, g_b, rowsA, colsA, seenA,
                            rowsB, colsB, seenB, labA, labB, qs_l=qs_l)
        return out

    shard_loss_q.defvjp(lambda *a: _shard_fwd(*a[:-1], qs_l=a[-1]),
                        _shard_bwd)

    base_specs = (P(data_axis, None), P(data_axis, None),
                  P(None, AXIS, None), P(None, None), P(None, None),
                  P(None), P(None), P(None), P(None), P(None), P(None),
                  P(data_axis), P(data_axis))
    inner = jax.shard_map(
        shard_loss,
        mesh=mesh,
        in_specs=base_specs,
        out_specs=(P(data_axis),) * 10,
        check_vma=False,
    )
    inner_q = jax.shard_map(
        shard_loss_q,
        mesh=mesh,
        in_specs=base_specs + (P(None, AXIS),),
        out_specs=(P(data_axis),) * 10,
        check_vma=False,
    )

    def loss_fn(emb_x, emb_y, queue, g_a, g_b, plan_a, plan_b,
                labels_a, labels_b, qscales=None):
        rowsA, colsA, seenA = plan_a
        rowsB, colsB, seenB = plan_b
        args = (emb_x, emb_y, queue,
                jax.lax.stop_gradient(g_a), jax.lax.stop_gradient(g_b),
                rowsA, colsA, seenA, rowsB, colsB, seenB,
                labels_a, labels_b)
        out = inner(*args) if qscales is None else inner_q(*args, qscales)
        (ce1a, neg1a, ce2a, neg2a, ce1b, neg1b, ce2b, neg2b,
         hit_a, hit_b) = out

        losses = (reduce_margin_dir(ce1a, neg1a, ce2a, neg2a, labels_a),
                  reduce_margin_dir(ce1b, neg1b, ce2b, neg2b, labels_b))
        if with_acc:
            n_pos = jnp.maximum(
                jnp.sum((labels_a >= 0).astype(jnp.float32))
                + jnp.sum((labels_b >= 0).astype(jnp.float32)), 1.0)
            return losses, (jnp.sum(hit_a) + jnp.sum(hit_b)) / n_pos
        return losses

    return loss_fn
