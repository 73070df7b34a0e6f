"""Sharded sparse-d_w streaming softmax (parallel/sharded_sparse.py):
exactness of the forward/merged quantities and of selected-row gradients
vs the dense path, on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vlsfr_tpu.ops.margin import add_margin
from vlsfr_tpu.parallel.mesh import make_mesh
from vlsfr_tpu.parallel.sharded_sparse import make_sharded_sparse_streaming_grads


def make_case(rng, b=8, c=256, d=16):
    emb = rng.standard_normal((b, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    w = rng.standard_normal((c, d)).astype(np.float32)
    labels = rng.integers(0, c, size=b).astype(np.int32)
    return emb, w, labels


def place(mesh, emb, w, labels, d_ce, d_neg):
    e = jax.device_put(emb, NamedSharding(mesh, P("data", None)))
    ww = jax.device_put(w, NamedSharding(mesh, P("model", None)))
    l = jax.device_put(labels, NamedSharding(mesh, P("data")))
    dc = jax.device_put(d_ce, NamedSharding(mesh, P("data")))
    dn = jax.device_put(d_neg, NamedSharding(mesh, P("data")))
    return e, ww, l, dc, dn


def dense_loss(emb, w, labels, loss_type, scale):
    wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    return add_margin(emb @ wn.T, labels, loss_type=loss_type, margin=0.5,
                      scale=scale, hard_neg=1)


@pytest.mark.parametrize("loss_type", ["Arc", "AM"])
def test_forward_and_demb_exact(loss_type, rng):
    """ce/gt/d_emb are EXACT (only d_w is truncated) — they must match the
    dense reference regardless of which tiles each shard selected."""
    mesh = make_mesh(2, 4)
    emb, w, labels = make_case(rng)
    b = emb.shape[0]
    fn = make_sharded_sparse_streaming_grads(
        mesh, batch=b, feat_dim=emb.shape[1], num_classes=w.shape[0],
        sparse_grad_rate=0.1, loss_type=loss_type, margin=0.5, scale=24.0,
        mask_svfc=1.2, tile=16)
    d_ce = np.full((b,), 1.0 / b, np.float32)
    d_neg = np.zeros((b,), np.float32)
    key = jax.random.PRNGKey(5)
    ce, neg, topk, gt, d_emb, row_idx, d_w_rows = jax.jit(fn)(
        *place(mesh, emb, w, labels, d_ce, d_neg), key)

    want_loss = float(dense_loss(jnp.asarray(emb), jnp.asarray(w),
                                 jnp.asarray(labels), loss_type, 24.0))
    assert float(jnp.mean(ce)) == pytest.approx(want_loss, rel=1e-4)

    ge_ref = jax.grad(lambda e: dense_loss(e, jnp.asarray(w),
                                           jnp.asarray(labels), loss_type, 24.0))(
        jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(d_emb), np.asarray(ge_ref), atol=3e-5)

    wn = w / np.linalg.norm(w, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(gt),
                               np.sum(emb * wn[labels], axis=-1), atol=1e-5)


def test_selected_rows_exact_and_targets_covered(rng):
    """Weight-1 (deterministic) selected rows carry the EXACT dense d_w;
    every batch target's row is selected on its owner shard; all returned
    indices are unique and in-range-or-sentinel."""
    mesh = make_mesh(2, 4)
    emb, w, labels = make_case(rng)
    b, c = emb.shape[0], w.shape[0]
    fn = make_sharded_sparse_streaming_grads(
        mesh, batch=b, feat_dim=emb.shape[1], num_classes=c,
        sparse_grad_rate=1.0,  # rate 1 => every tile selected, weights all 1
        loss_type="Arc", margin=0.5, scale=24.0, mask_svfc=1.2, tile=16)
    d_ce = np.full((b,), 1.0 / b, np.float32)
    d_neg = np.zeros((b,), np.float32)
    ce, neg, topk, gt, d_emb, row_idx, d_w_rows = jax.jit(fn)(
        *place(mesh, emb, w, labels, d_ce, d_neg), jax.random.PRNGKey(0))

    row_idx = np.asarray(row_idx)
    d_w_rows = np.asarray(d_w_rows)
    valid = row_idx < c
    assert len(np.unique(row_idx[valid])) == valid.sum(), "duplicate rows"
    for lab in labels:
        assert lab in row_idx, f"target row {lab} not selected"

    # rate 1.0 ⇒ full coverage ⇒ the scattered d_w equals the dense grad
    gw_ref = jax.grad(lambda ww: dense_loss(jnp.asarray(emb), ww,
                                            jnp.asarray(labels), "Arc", 24.0))(
        jnp.asarray(w))
    dense_from_sparse = np.zeros_like(np.asarray(w))
    dense_from_sparse[row_idx[valid]] = d_w_rows[valid]
    np.testing.assert_allclose(dense_from_sparse, np.asarray(gw_ref), atol=3e-5)


def test_sharded_matches_single_chip_at_full_rate(rng):
    """rate 1.0: the sharded composition reproduces the single-chip
    explicit op's outputs exactly (selection covers everything, so the only
    differences would be collective-merge bugs)."""
    from vlsfr_tpu.ops.margin_pallas import streaming_sparse_margin_grads

    mesh = make_mesh(2, 4)
    emb, w, labels = make_case(rng, b=8, c=128, d=16)
    b, c = emb.shape[0], w.shape[0]
    d_ce = np.full((b,), 1.0 / b, np.float32)
    d_neg = np.zeros((b,), np.float32)
    ce1, _, topk1, gt1, de1, ri1, dw1 = streaming_sparse_margin_grads(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels),
        jnp.asarray(d_ce), jnp.asarray(d_neg), m_tiles=10**9,
        loss_type="Arc", margin=0.5, scale=24.0, hard_neg=1,
        mask_svfc=1.2, tile=16, key=None)
    fn = make_sharded_sparse_streaming_grads(
        mesh, batch=b, feat_dim=emb.shape[1], num_classes=c,
        sparse_grad_rate=1.0, loss_type="Arc", margin=0.5, scale=24.0,
        mask_svfc=1.2, tile=16)
    ce2, _, topk2, gt2, de2, ri2, dw2 = jax.jit(fn)(
        *place(mesh, emb, w, labels, d_ce, d_neg), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(ce2), np.asarray(ce1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gt2), np.asarray(gt1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(topk2), np.asarray(topk1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(de2), np.asarray(de1), atol=3e-5)
    dense1 = np.zeros_like(np.asarray(w))
    r1, v1 = np.asarray(ri1), np.asarray(dw1)
    dense1[r1[r1 < c]] = v1[r1 < c]
    dense2 = np.zeros_like(dense1)
    r2, v2 = np.asarray(ri2), np.asarray(dw2)
    dense2[r2[r2 < c]] = v2[r2 < c]
    np.testing.assert_allclose(dense2, dense1, atol=3e-5)


def test_trainer_routes_sharded_sparse(rng, tmp_path):
    """make_softmax_train_step with mesh model>1 + streaming + sparse_update
    routes through the sharded-sparse head: loss finite, selected classifier
    rows move, untouched rows stay."""
    from vlsfr_tpu.config import Config
    from vlsfr_tpu.optim import make_optimizer, make_schedule
    from vlsfr_tpu.train.softmax_head import (
        create_softmax_state,
        make_softmax_train_step,
    )
    from vlsfr_tpu.models import create_net
    from vlsfr_tpu.parallel.mesh import (
        batch_sharding,
        class_vector_sharding,
        classifier_sharding,
    )

    mesh = make_mesh(2, 4)
    # large enough that each model shard holds several 512-wide tiles —
    # otherwise the force-include floor covers every tile and no row stays
    # untouched (c_local = 8192 -> 16 tiles; rate 0.05 + floor 8 -> half)
    c = 32768
    cfg = Config()
    cfg.model.net_type = "toy"
    cfg.model.feat_dim = 16
    cfg.data.batch_size = 8
    cfg.data.image_size = 16
    cfg.pool.head = "full_softmax"
    cfg.pool.num_classes = c
    cfg.pool.use_fused = "on"
    cfg.pool.sparse_update = True
    cfg.pool.sparse_grad_rate = 0.05
    model = create_net("toy", feat_dim=16)
    optimizer = make_optimizer(cfg.optim)
    schedule = make_schedule(cfg.optim, steps_per_epoch=10)
    state = create_softmax_state(jax.random.PRNGKey(0), model, cfg, optimizer,
                                 16, c, mesh=mesh)
    state = state.replace(
        params=dict(state.params,
                    classifier=jax.device_put(state.params["classifier"],
                                              classifier_sharding(mesh))),
        opt_state=dict(state.opt_state,
                       classifier_mom=jax.device_put(
                           state.opt_state["classifier_mom"], classifier_sharding(mesh)),
                       classifier_last=jax.device_put(
                           state.opt_state["classifier_last"], class_vector_sharding(mesh))),
    )
    step = jax.jit(make_softmax_train_step(model, cfg, optimizer, schedule, mesh=mesh))
    w0 = np.asarray(state.params["classifier"]).copy()
    images = jax.device_put(
        rng.standard_normal((8, 16, 16, 3)).astype(np.float32), batch_sharding(mesh))
    labels = jax.device_put(rng.integers(0, c, size=8).astype(np.int32),
                            batch_sharding(mesh))
    state, metrics = step(state, images, labels, 1.0)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["train_acc"]) <= 1.0
    w1 = np.asarray(state.params["classifier"])
    changed = ~np.all(np.isclose(w0, w1, atol=0), axis=1)
    for lab in np.asarray(labels):
        assert changed[lab], f"target row {lab} did not update"
    assert changed.sum() < c, "some rows must remain untouched at rate 0.05"


def test_pallas_leg_matches_scan(rng):
    """The TPU leg (full Pallas kernels per shard, interpret mode) must
    reproduce the scan leg's exact outputs — ce, gt, d_emb, AND the
    selected-rows d_w (selection is deterministic given the key)."""
    mesh = make_mesh(2, 4)
    emb, w, labels = make_case(rng)
    b = emb.shape[0]
    kw = dict(batch=b, feat_dim=emb.shape[1], num_classes=w.shape[0],
              sparse_grad_rate=0.2, loss_type="Arc", margin=0.5, scale=24.0,
              mask_svfc=1.2, tile=16)
    d_ce = np.full((b,), 1.0 / b, np.float32)
    d_neg = np.zeros((b,), np.float32)
    key = jax.random.PRNGKey(5)
    placed = place(mesh, emb, w, labels, d_ce, d_neg)
    out_scan = jax.jit(make_sharded_sparse_streaming_grads(
        mesh, use_pallas=False, **kw))(*placed, key)
    out_pallas = jax.jit(make_sharded_sparse_streaming_grads(
        mesh, use_pallas=True, interpret=True, **kw))(*placed, key)
    names = ["ce", "neg", "topk", "gt", "d_emb", "row_idx", "d_w_rows"]
    for name, a, p in zip(names, out_scan, out_pallas):
        np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=3e-5,
                                   err_msg=name)
