"""Sharded + sparse-d_w streaming softmax: the exact-loss 10M-identity path.

Completes the large-class-axis matrix (SURVEY.md §7 hard part 3): round 2's
single-chip sparse-d_w streaming head (exact full-softmax loss, classifier
gradient truncated to the most relevant class tiles, sparse row optimizer —
ops/margin_pallas.streaming_sparse_margin_grads) lifted onto the mesh
``model`` axis:

* classifier [C, D] split row-wise over "model" (C divisible by the axis);
* each shard streams its local block once with per-tile stats; the global
  logsumexp merges per-shard logz with ``pmax``/``psum``; the top-k merges
  with ``all_gather`` + ``top_k`` (same collectives as
  parallel/sharded_margin.py);
* each shard then runs the relevance selector over ITS tiles (targets it
  owns force-included, per-shard random fill, stratified importance
  weights — ops/margin_pallas.select_relevant_tiles) and computes d_w for
  only its selected tiles — the classifier gradient never densifies
  anywhere, per shard OR globally;
* row indices return globally numbered and globally unique (shards own
  disjoint ranges), so one ``sparse_sgd_rows`` scatter updates the
  GSPMD-sharded classifier/momentum with writes local to each shard.

Like the single-chip op this is EXPLICIT fwd+grads (not a custom_vjp):
``jax.grad`` would demand a dense [C, D] cotangent — exactly the traffic
this path deletes. ``d_emb`` is exact by default (``exact_demb``); only
the classifier update is truncated (Partial-FC's update semantics with
mass-directed row choice — accuracy study in docs/PERF.md).

Parity with the single-chip op is tested on the 8-device CPU mesh in
tests/test_sharded_sparse.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vlsfr_tpu.ops.margin_pallas import (
    _normalize_rows,
    _phi_target,
    _sparse_bwd_gather,
    _stream_bwd,
    _stream_fwd,
    pallas_margin_ce_bwd,
    pallas_margin_ce_bwd_sparse,
    pallas_margin_ce_fwd,
    select_relevant_tiles,
    sparse_bwd_geometry,
)

AXIS = "model"


def make_sharded_sparse_streaming_grads(
    mesh, *, batch, feat_dim, num_classes, sparse_grad_rate=0.05,
    loss_type="Arc", margin=0.5, scale=32.0, hard_neg=1, mask_svfc=1.2,
    normalize_w=True, tile=512, random_frac=0.5, exact_demb=True,
    use_pallas="auto", data_axis="data", interpret=False,
):
    """Returns fn(emb, w, labels, d_ce, d_neg, key) ->
    (ce, neg, topk, gt, d_emb, row_idx, d_w_rows).

    emb [B, D] P(data, None); w [C, D] P(model, None); labels [B] P(data)
    (global class ids — full-softmax training has no outlier rows; a
    global -1 label gets zero CE cotangent but its hard-negative d_neg
    push is NOT routed on this path); d_ce/d_neg [B] P(data) analytic
    output cotangents;
    ``key`` a PRNGKey (replicated — each shard folds in its axis index for
    independent random tile fill). Outputs: per-row quantities P(data);
    ``row_idx`` [S·M·tile] int32 and ``d_w_rows`` [S·M·tile, D] f32
    sharded P(model) — globally-numbered, globally-unique rows (entries
    ≥ C are padding; scatter with mode='drop', as
    train/sparse_classifier.sparse_sgd_rows does).
    """
    m_size = mesh.shape[AXIS]
    assert num_classes % m_size == 0, (
        f"num_classes {num_classes} must divide the model axis {m_size} "
        "(shard_map row sharding)")
    c_local = num_classes // m_size
    tile_eff, n_tiles_local = sparse_bwd_geometry(batch, feat_dim, c_local, tile)
    # every batch target could land on ONE shard — the force-include
    # guarantee needs room for min(B, n_tiles_local) tiles per shard
    m_tiles = min(
        n_tiles_local,
        max(int(round(sparse_grad_rate * n_tiles_local)),
            min(batch, n_tiles_local), 8),
    )
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
              mask_svfc=mask_svfc, normalize_w=normalize_w, tile=tile_eff)

    def shard_body(emb_l, w_l, labels_l, d_ce_l, d_neg_l, key):
        b = emb_l.shape[0]
        emb32 = emb_l.astype(jnp.float32)
        pallas = use_pallas
        if pallas == "auto":
            pallas = jax.default_backend() == "tpu"
        c0 = jax.lax.axis_index(AXIS) * c_local
        ll = labels_l - c0
        owned = (ll >= 0) & (ll < c_local)
        # Non-owned rows get a VALID but unmatchable sentinel label (far
        # beyond any padded column), NOT -1: the streaming kernels read
        # label < 0 as "outlier row — no CE gradient", which would drop the
        # negative-push d_cos from this shard's columns for every row whose
        # target lives elsewhere (measured: 100% wrong d_emb). With the
        # sentinel, is_target is false at every column, d_gt contributions
        # are exactly zero, and the selector's force-include scatter drops
        # the out-of-range tile index.
        sentinel = jnp.int32(1 << 30)
        local_labels = jnp.where(owned, ll, sentinel).astype(jnp.int32)

        # global target cosine: only the owner shard's gather contributes
        wl = w_l[jnp.where(owned, ll, 0)]
        if normalize_w:
            wl = _normalize_rows(wl)
        gt_part = jnp.sum(emb32 * wl.astype(jnp.float32), axis=-1)
        gt = jax.lax.psum(jnp.where(owned, gt_part, 0.0), AXIS)

        pkw = dict(interpret=interpret) if pallas else {}
        fwd = pallas_margin_ce_fwd if pallas else _stream_fwd
        _, _, logz_l, topk_l, maxz, maxcos = fwd(
            emb_l, w_l, local_labels, gt, with_stats=True, **kw, **pkw)

        # collective logsumexp + top-k merge (parallel/sharded_margin.py)
        gmax = jax.lax.pmax(logz_l, AXIS)
        s = jax.lax.psum(jnp.exp(logz_l - gmax), AXIS)
        logz = gmax + jnp.log(s)
        topk_all = jax.lax.all_gather(topk_l, AXIS)
        topk_all = jnp.moveaxis(topk_all, 0, 1).reshape(b, -1)
        topk, _ = jax.lax.top_k(topk_all, hard_neg)

        pos = labels_l >= 0
        phi = _phi_target(gt, loss_type, margin, mask_svfc)
        ce = jnp.where(pos, logz - scale * phi, 0.0)
        neg = jnp.where(pos, 0.0, jnp.mean(jnp.maximum(topk, 0.0), axis=-1))
        d_ce_m = jnp.where(pos, d_ce_l, 0.0)
        d_neg_m = jnp.where(pos, 0.0, d_neg_l)

        # Per-shard relevance selection over LOCAL tiles. The selector's
        # inputs are all-gathered over the DATA axis first so every data
        # shard of one model column picks the IDENTICAL tile set (selection
        # is data-dependent through maxz/labels; without this each data
        # shard returns d_w for a different row set and the unmentioned
        # "data" axis in the output spec silently keeps one shard's
        # partial). The random-fill key folds in the MODEL index only, for
        # the same reason. d_w for the chosen tiles is then summed over
        # "data" below — the reduce-scatter of classifier grads.
        def gather_rows(x):
            g = jax.lax.all_gather(x, data_axis)  # [n_data, B_l, ...]
            return g.reshape((-1,) + x.shape[1:])

        def gather_cols(x):  # [n_tiles, B_l] -> [n_tiles, B]
            g = jax.lax.all_gather(x, data_axis)
            return jnp.moveaxis(g, 0, 1).reshape(x.shape[0], -1)

        key_l = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
        tile_idx, tile_weight = select_relevant_tiles(
            gather_cols(maxz), gather_cols(maxcos), gather_rows(logz),
            gather_rows(topk), gather_rows(local_labels), m_tiles, tile_eff,
            key=key_l, random_frac=random_frac)

        bwd_sparse = pallas_margin_ce_bwd_sparse if pallas else _sparse_bwd_gather
        d_emb_trunc, d_w_rows = bwd_sparse(
            emb_l, w_l, local_labels, gt, logz, topk, d_ce_m, d_neg_m,
            tile_idx, **kw, **pkw)
        d_w_rows = d_w_rows * jnp.repeat(tile_weight, tile_eff)[:, None]
        d_w_rows = jax.lax.psum(d_w_rows, data_axis)
        if exact_demb:
            bwd_full = pallas_margin_ce_bwd if pallas else _stream_bwd
            d_emb, _ = bwd_full(emb_l, w_l, local_labels, gt, logz, topk,
                                d_ce_m, d_neg_m, grad_w=False, **kw, **pkw)
        else:
            d_emb = d_emb_trunc
        # each shard holds a PARTIAL d_emb (its columns' pushes + the
        # owner's gt path); complete it here so the output is replicated
        # over "model"
        d_emb = jax.lax.psum(d_emb.astype(jnp.float32), AXIS)

        row_local = (
            tile_idx[:, None] * tile_eff
            + jnp.arange(tile_eff, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        # globally numbered; local padding rows (≥ c_local) must map OUT of
        # [0, C) — c0 + row would land in the next shard's range
        row_idx = jnp.where(row_local < c_local, c0 + row_local,
                            jnp.int32(num_classes))
        return ce, neg, topk, gt, d_emb.astype(emb_l.dtype), row_idx, d_w_rows

    return jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(AXIS, None), P(data_axis),
                  P(data_axis), P(data_axis), P()),
        out_specs=(P(data_axis), P(data_axis), P(data_axis, None),
                   P(data_axis), P(data_axis, None), P(AXIS), P(AXIS, None)),
        check_vma=False,
    )
