"""Full-softmax margin-classifier training (BASELINE configs 1-2).

The reference trains ONLY through the FFC/DCP head; a dense ArcFace
classifier is the natural baseline it compares against (and the first
end-to-end slice per SURVEY.md §7 stage 4). One network, one classifier
matrix [num_classes, feat_dim] (shardable over the mesh ``model`` axis via
parallel/partial_fc.py), margin-softmax CE from the shared ops.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from vlsfr_tpu.config import Config
from vlsfr_tpu.parallel.partial_fc import margin_softmax_loss, sample_classes


class SoftmaxState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # {"backbone": ..., "classifier": [C, D]}
    batch_stats: Any
    opt_state: Any


def _streaming_on(cfg: Config) -> bool:
    if cfg.pool.use_fused == "auto":
        return cfg.pool.num_classes >= cfg.pool.streaming_threshold
    return cfg.pool.use_fused == "on"


def _fused_update_on(cfg: Config, mesh=None) -> bool:
    """True when the classifier update runs INSIDE the streaming backward
    (ops/margin_pallas.streaming_margin_grads_fused_sgd) — the dense [C, D]
    d_w then never exists in HBM. Requires the dense streaming head, SGD,
    and no global-norm clipping (it couples the classifier update to
    backbone grads that don't exist yet at stream time). Any mesh works:
    a data axis > 1 replicates the head compute on all-gathered embeddings
    (the classifier is replicated under DP, every chip computes the
    identical update); a model axis > 1 shards the class rows and runs the
    per-shard fused kernel with collective logsumexp merges
    (parallel/sharded_fused.py). ``mesh`` is therefore UNUSED since round
    3 (eligibility is mesh-independent) — kept so call sites stay
    symmetric with _sparse_classifier_mode, which does route on it."""
    if cfg.pool.fused_update == "off":
        return False
    if not _streaming_on(cfg) or cfg.pool.sample_rate > 0 or cfg.pool.sparse_update:
        return False
    eligible = cfg.optim.optim == "SGD" and cfg.optim.grad_clip == 0
    if cfg.pool.fused_update == "on" and not eligible:
        raise ValueError(
            "pool.fused_update=on requires the dense streaming head, SGD and "
            "optim.grad_clip=0; use 'auto' to fall back")
    return eligible


def _sparse_classifier_mode(cfg: Config, mesh=None) -> bool:
    """True when the classifier is updated by hand with a bare momentum
    buffer (sparse rows) instead of living inside the optax state: either
    partial-FC sampling + sparse_update, or the sparse-d_w streaming head —
    single-chip (ops/margin_pallas.streaming_sparse_margin_grads) and
    model-sharded (parallel/sharded_sparse.py) alike."""
    if not cfg.pool.sparse_update:
        return False
    if cfg.pool.sample_rate > 0:
        return True
    return _streaming_on(cfg)


def create_softmax_state(
    rng: jax.Array, model, cfg: Config, optimizer, image_size: int, num_classes: int,
    mesh=None,
) -> SoftmaxState:
    k_model, k_w = jax.random.split(rng)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(k_model, dummy, train=False)
    cls_dtype = jnp.dtype(cfg.pool.classifier_dtype)

    # under jit so generate→scale→cast fuses: the eager fp32 intermediate is
    # 8 GB at 4M×512 — an init-time OOM on a 16 GB chip
    @partial(jax.jit, static_argnums=(1, 2, 3))
    def _init_classifier(key, c, d, dt):
        return (jax.random.normal(key, (c, d), jnp.float32) * 0.01).astype(dt)

    params = {
        "backbone": variables["params"],
        # ArcFace-style classifier init: small normal; rows are re-normalized
        # every forward so only direction matters
        "classifier": _init_classifier(k_w, num_classes, cfg.model.feat_dim, cls_dtype),
    }
    if _fused_update_on(cfg, mesh):
        # fused-update mode: optax only owns the backbone; the classifier's
        # SGD-momentum state is a bare buffer updated inside the streaming
        # backward kernel (no classifier_last — every row is visited every
        # step, there is no catch-up to track). Storage dtype is
        # pool.classifier_mom_dtype (f32 default; bf16 = measured 1.32x on
        # the fused head, docs/PERF.md round 3)
        opt_state = {
            "backbone": optimizer.init(params["backbone"]),
            "classifier_mom": jnp.zeros(
                params["classifier"].shape,
                jnp.dtype(cfg.pool.classifier_mom_dtype)),
        }
    elif _sparse_classifier_mode(cfg, mesh):
        # sparse-classifier mode: optax only owns the backbone; the
        # classifier gets a bare momentum buffer (train/sparse_classifier.py)
        opt_state = {
            "backbone": optimizer.init(params["backbone"]),
            # momentum storage stays f32 even for a bf16 classifier —
            # sparse_sgd_rows computes in f32, and bf16 STORAGE would round
            # away small accumulated updates at every visit (the weights'
            # own bf16 rounding is the accepted tradeoff; the momentum's is
            # not, it compounds geometrically)
            "classifier_mom": jnp.zeros(params["classifier"].shape, jnp.float32),
            # last-visit step per row: visit-age momentum catch-up
            # (train/sparse_classifier.py)
            "classifier_last": jnp.zeros((num_classes,), jnp.int32),
        }
    else:
        opt_state = optimizer.init(params)
    return SoftmaxState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt_state,
    )


def make_softmax_train_step(model, cfg: Config, optimizer, schedule, mesh=None) -> Callable:
    streaming = _streaming_on(cfg)
    model_sharded = mesh is not None and mesh.shape.get("model", 1) > 1
    if cfg.pool.sample_rate > 0:
        # partial-FC sampling: per-step denominator = positives + sampled
        # negatives (arXiv 2010.05222); key derived from the step counter.
        # Returns a dedicated train_step so the sampled index set is shared
        # between the loss and the (optionally sparse) classifier update.
        num_sampled = max(
            cfg.data.batch_size,
            int(cfg.pool.num_classes * cfg.pool.sample_rate),
        )
        return _make_sampled_train_step(model, cfg, optimizer, schedule, num_sampled)

    if streaming and cfg.pool.sparse_update:
        # sparse-d_w streaming: exact loss, gradient truncated to the most
        # relevant class tiles, sparse row optimizer — single-chip
        # (docs/PERF.md round-2 work) or per-shard over the mesh model axis
        # (parallel/sharded_sparse.py)
        return _make_streaming_sparse_train_step(
            model, cfg, optimizer, schedule,
            mesh=mesh if model_sharded else None)

    if _fused_update_on(cfg, mesh):
        # dense streaming with the classifier SGD update fused into the
        # backward stream — exact optax semantics, no [C, D] d_w in HBM
        return _make_streaming_fused_train_step(model, cfg, optimizer, schedule,
                                                mesh=mesh)

    if streaming and model_sharded:
        # BASELINE config 5 path: class shards × streaming via shard_map
        from vlsfr_tpu.parallel.sharded_margin import make_sharded_streaming_loss

        sharded_loss = make_sharded_streaming_loss(
            mesh,
            loss_type=cfg.loss.loss_type,
            margin=cfg.loss.margin,
            scale=cfg.loss.scale,
            hard_neg=1,  # no outlier rows in full-softmax training
            mask_svfc=cfg.loss.mask_svfc,
        )

        def head_loss(emb, weights, labels, step):
            del step
            return sharded_loss(emb, weights, labels)

    else:
        loss_kw = dict(
            loss_type=cfg.loss.loss_type,
            margin=cfg.loss.margin,
            scale=cfg.loss.scale,
            mask_svfc=cfg.loss.mask_svfc,
            streaming=streaming,
        )

        def head_loss(emb, weights, labels, step):
            del step
            return margin_softmax_loss(emb, weights, labels, mesh=mesh, **loss_kw)

    def loss_fn(params, batch_stats, images, labels, step):
        emb, mut = model.apply(
            {"params": params["backbone"], "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        loss, metrics = head_loss(emb, params["classifier"], labels, step)
        return loss, (mut["batch_stats"], metrics)

    def train_step(state: SoftmaxState, images, labels, lr_scale):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, images, labels, state.step
        )
        lr = schedule(state.step) * lr_scale
        state.opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        metrics = dict(metrics, loss=loss, lr=lr)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            metrics,
        )

    return train_step


def _make_sampled_train_step(model, cfg: Config, optimizer, schedule, num_sampled: int):
    """Partial-FC sampled train step; with cfg.pool.sparse_update the
    classifier momentum/update touch only the sampled rows."""
    from vlsfr_tpu.train.sparse_classifier import sparse_sgd_rows

    loss_kw = dict(
        loss_type=cfg.loss.loss_type,
        margin=cfg.loss.margin,
        scale=cfg.loss.scale,
        mask_svfc=cfg.loss.mask_svfc,
    )
    sparse = cfg.pool.sparse_update
    c = cfg.pool.num_classes

    def train_step(state: SoftmaxState, images, labels, lr_scale):
        key = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        # shared partial-FC construction (parallel/partial_fc.py): unique
        # positives + collision-masked negatives; `valid` masks duplicate
        # columns out of the denominator and out of the sparse update
        sampled, local_labels, valid = sample_classes(labels, c, num_sampled, key)
        w_sub = state.params["classifier"][sampled]

        def loss_fn(backbone_params, w_sub_, batch_stats):
            emb, mut = model.apply(
                {"params": backbone_params, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            loss, metrics = margin_softmax_loss(emb, w_sub_, local_labels,
                                                col_mask=valid, **loss_kw)
            return loss, (mut["batch_stats"], metrics)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, (new_stats, metrics)), (g_backbone, g_wsub) = grad_fn(
            state.params["backbone"], w_sub, state.batch_stats
        )
        lr = schedule(state.step) * lr_scale
        metrics = dict(metrics, loss=loss, lr=lr,
                       sampled_classes=jnp.int32(num_sampled))

        if sparse:
            state.opt_state["backbone"].hyperparams["learning_rate"] = lr
            upd_b, new_bopt = optimizer.update(
                g_backbone, state.opt_state["backbone"], state.params["backbone"]
            )
            new_backbone = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), state.params["backbone"], upd_b)
            # invalid (duplicate/collision) positions carry exact-zero grads
            # but would still receive weight decay — route them to the
            # out-of-bounds sentinel so the scatter drops them; the remaining
            # indices are UNIQUE, so the momentum update is unambiguous
            upd_idx = jnp.where(valid, sampled, jnp.int32(c))
            new_w, new_mom, new_last = sparse_sgd_rows(
                state.params["classifier"], state.opt_state["classifier_mom"],
                upd_idx, g_wsub,
                lr=lr, momentum=cfg.optim.momentum,
                weight_decay=cfg.optim.weight_decay, nesterov=cfg.optim.nesterov,
                last_visit=state.opt_state["classifier_last"], step=state.step,
            )
            new_params = {"backbone": new_backbone, "classifier": new_w}
            new_opt = {"backbone": new_bopt, "classifier_mom": new_mom,
                       "classifier_last": new_last}
        else:
            # dense optimizer: scatter the sampled grads into a full [C, D]
            # gradient (rows not sampled get exact zeros)
            g_full = jnp.zeros_like(state.params["classifier"]).at[sampled].add(g_wsub)
            grads = {"backbone": g_backbone, "classifier": g_full}
            state.opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), state.params, updates)

        return (
            state.replace(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt),
            metrics,
        )

    return train_step


def _make_streaming_fused_train_step(model, cfg: Config, optimizer, schedule,
                                     mesh=None):
    """Dense streaming full-softmax with the classifier SGD-momentum update
    FUSED into the streaming backward (ops/margin_pallas.py fused-SGD
    section). Identical trajectory to the dense streaming + optax path
    (bit-exact in f32, tests/test_fused_update.py) at ~5.3 GB/step less
    HBM traffic at C=1M: the [C, D] d_w is consumed in-register, tile by
    tile, in the same pass that computes it.

    Like the sparse step, the head runs OUTSIDE jax.grad (a custom_vjp
    cannot return updated optimizer state through a cotangent): the
    backbone is differentiated via jax.vjp on d_emb, the classifier's
    (new_w, new_mom) come straight from the kernel.

    With a data axis > 1 the head runs under shard_map: embeddings/labels
    are all-gathered over "data" (a [B, D] transfer — tiny next to the
    [C, D] stream) and every chip computes the IDENTICAL full-batch
    update on its replicated classifier — the same replicated head
    compute the dense+optax path's GSPMD partitioning produces, minus the
    d_w materialization. d_emb is sliced back to the local batch rows.
    """
    from vlsfr_tpu.ops.margin_pallas import streaming_margin_grads_fused_sgd

    loss_kw = dict(
        loss_type=cfg.loss.loss_type,
        margin=cfg.loss.margin,
        scale=cfg.loss.scale,
        mask_svfc=cfg.loss.mask_svfc,
    )
    sgd_kw = dict(
        momentum=cfg.optim.momentum, nesterov=cfg.optim.nesterov,
        weight_decay=cfg.optim.weight_decay,
    )

    def head_global(emb_g, w, mom, labels_g, lr):
        bg = emb_g.shape[0]
        # loss = mean(ce): analytic output cotangents (no outlier rows here)
        d_ce = jnp.full((bg,), 1.0 / bg, jnp.float32)
        d_neg = jnp.zeros((bg,), jnp.float32)
        return streaming_margin_grads_fused_sgd(
            emb_g.astype(jnp.float32), w, mom, labels_g, d_ce, d_neg, lr,
            hard_neg=1, **sgd_kw, **loss_kw,
        )

    model_sharded = mesh is not None and mesh.shape.get("model", 1) > 1
    data_sharded = mesh is not None and mesh.shape.get("data", 1) > 1
    if model_sharded:
        # class-sharded classifier: per-shard fused kernels + collective
        # logsumexp merges (parallel/sharded_fused.py); handles any data
        # axis internally (embeddings all-gathered over "data")
        from vlsfr_tpu.parallel.sharded_fused import make_sharded_fused_sgd_head

        head = make_sharded_fused_sgd_head(
            mesh, hard_neg=1, normalize_w=True, **sgd_kw, **loss_kw)
    elif data_sharded:
        from jax.sharding import PartitionSpec as P

        def head_local(emb_l, w, mom, labels_l, lr):
            emb_g = jax.lax.all_gather(emb_l, "data", axis=0, tiled=True)
            labels_g = jax.lax.all_gather(labels_l, "data", axis=0, tiled=True)
            ce, neg, topk, gt, d_emb_g, new_w, new_mom = head_global(
                emb_g, w, mom, labels_g, lr)
            i = jax.lax.axis_index("data")
            d_emb_l = jax.lax.dynamic_slice_in_dim(
                d_emb_g, i * emb_l.shape[0], emb_l.shape[0], axis=0)
            return ce, neg, topk, gt, d_emb_l.astype(emb_l.dtype), new_w, new_mom

        head = jax.shard_map(
            head_local, mesh=mesh,
            in_specs=(P("data"), P(), P(), P("data"), P()),
            out_specs=(P(), P(), P(), P(), P("data"), P(), P()),
            check_vma=False,
        )
    else:
        head = head_global

    def train_step(state: SoftmaxState, images, labels, lr_scale):
        def backbone_fn(backbone_params):
            emb, mut = model.apply(
                {"params": backbone_params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            return emb, mut["batch_stats"]

        emb, backbone_vjp, new_stats = jax.vjp(
            backbone_fn, state.params["backbone"], has_aux=True
        )
        lr = schedule(state.step) * lr_scale
        ce, _neg, topk, gt, d_emb, new_w, new_mom = head(
            emb, state.params["classifier"],
            state.opt_state["classifier_mom"], labels, lr,
        )
        loss = jnp.mean(ce)
        (g_backbone,) = backbone_vjp(d_emb.astype(emb.dtype))
        acc = jnp.mean((gt >= topk[:, 0]).astype(jnp.float32))

        state.opt_state["backbone"].hyperparams["learning_rate"] = lr
        upd_b, new_bopt = optimizer.update(
            g_backbone, state.opt_state["backbone"], state.params["backbone"]
        )
        new_backbone = jax.tree.map(
            lambda p, u: (p + u).astype(p.dtype), state.params["backbone"], upd_b)
        metrics = {"loss": loss, "ce": loss, "train_acc": acc, "lr": lr}
        return (
            state.replace(
                step=state.step + 1,
                params={"backbone": new_backbone, "classifier": new_w},
                batch_stats=new_stats,
                opt_state={"backbone": new_bopt, "classifier_mom": new_mom},
            ),
            metrics,
        )

    return train_step


def _make_streaming_sparse_train_step(model, cfg: Config, optimizer, schedule,
                                      mesh=None):
    """Streaming full-softmax with a SPARSE classifier gradient+update.

    The dense streaming backward's floor is the [C, D] d_w write plus the
    dense SGD-momentum traffic (~12 GB/step at C=1M, docs/PERF.md). Here the
    head runs OUTSIDE jax.grad: the backbone is differentiated via jax.vjp,
    the head computes (exact loss, d_emb, sparse d_w rows) in one explicit
    call, and the classifier update touches only the selected rows
    (train/sparse_classifier.sparse_sgd_rows). The gradient truncation is
    the Partial-FC approximation applied to the backward only — the loss
    itself stays the exact full softmax.

    With a mesh whose model axis > 1 the head runs per classifier shard with
    collective logsumexp/top-k merges and per-shard tile selection
    (parallel/sharded_sparse.py) — the d_w never densifies per shard OR
    globally; otherwise the single-chip explicit op
    (ops/margin_pallas.streaming_sparse_margin_grads).
    """
    from vlsfr_tpu.ops.margin_pallas import (
        sparse_bwd_geometry,
        streaming_sparse_margin_grads,
    )
    from vlsfr_tpu.train.sparse_classifier import sparse_sgd_rows

    c = cfg.pool.num_classes
    loss_kw = dict(
        loss_type=cfg.loss.loss_type,
        margin=cfg.loss.margin,
        scale=cfg.loss.scale,
        mask_svfc=cfg.loss.mask_svfc,
    )
    if mesh is not None:
        from vlsfr_tpu.parallel.sharded_sparse import (
            make_sharded_sparse_streaming_grads,
        )

        sharded_head = make_sharded_sparse_streaming_grads(
            mesh, batch=cfg.data.batch_size, feat_dim=cfg.model.feat_dim,
            num_classes=c, sparse_grad_rate=cfg.pool.sparse_grad_rate,
            hard_neg=1, normalize_w=True, **loss_kw,
        )

        def head_grads(emb, w, labels, d_ce, d_neg, key):
            return sharded_head(emb, w, labels, d_ce, d_neg, key)
    else:
        # 512-wide tiles measured fastest at ir50/b128/1M on v5e (1024
        # halves the grid but VMEM pressure breaks double-buffering:
        # 101 vs 72 ms/step)
        tile, n_tiles = sparse_bwd_geometry(cfg.data.batch_size, cfg.model.feat_dim, c)
        # targets are force-included, so m_tiles must be able to hold one
        # tile per batch row in the worst (all-distinct-tiles) case
        m_tiles = min(
            n_tiles,
            max(int(round(cfg.pool.sparse_grad_rate * n_tiles)), cfg.data.batch_size, 8),
        )

        def head_grads(emb, w, labels, d_ce, d_neg, key):
            return streaming_sparse_margin_grads(
                emb, w, labels, d_ce, d_neg,
                m_tiles=m_tiles, hard_neg=1, normalize_w=True, tile=tile,
                key=key, **loss_kw,
            )

    def train_step(state: SoftmaxState, images, labels, lr_scale):
        def backbone_fn(backbone_params):
            emb, mut = model.apply(
                {"params": backbone_params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            return emb, mut["batch_stats"]

        emb, backbone_vjp, new_stats = jax.vjp(
            backbone_fn, state.params["backbone"], has_aux=True
        )
        b = labels.shape[0]
        # loss = mean(ce): analytic output cotangents (no outlier rows here)
        d_ce = jnp.full((b,), 1.0 / b, jnp.float32)
        d_neg = jnp.zeros((b,), jnp.float32)
        # per-step key: random tile fill keeps negative-push coverage
        # unbiased in the diffuse regime (see select_relevant_tiles)
        key = jax.random.fold_in(jax.random.PRNGKey(23), state.step)
        ce, _neg, topk, gt, d_emb, row_idx, d_w_rows = head_grads(
            emb, state.params["classifier"], labels, d_ce, d_neg, key
        )
        loss = jnp.mean(ce)
        (g_backbone,) = backbone_vjp(d_emb)
        acc = jnp.mean((gt >= topk[:, 0]).astype(jnp.float32))

        lr = schedule(state.step) * lr_scale
        state.opt_state["backbone"].hyperparams["learning_rate"] = lr
        upd_b, new_bopt = optimizer.update(
            g_backbone, state.opt_state["backbone"], state.params["backbone"]
        )
        new_backbone = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), state.params["backbone"], upd_b)
        # row_idx entries >= C (padding-tile columns) are dropped by the
        # scatter; all remaining indices are unique by construction
        new_w, new_mom, new_last = sparse_sgd_rows(
            state.params["classifier"], state.opt_state["classifier_mom"],
            row_idx, d_w_rows,
            lr=lr, momentum=cfg.optim.momentum,
            weight_decay=cfg.optim.weight_decay, nesterov=cfg.optim.nesterov,
            last_visit=state.opt_state["classifier_last"], step=state.step,
        )
        metrics = {"loss": loss, "ce": loss, "train_acc": acc, "lr": lr,
                   # selected-row budget (per shard when mesh-sharded)
                   "grad_rows": jnp.int32(row_idx.shape[0])}
        return (
            state.replace(
                step=state.step + 1,
                params={"backbone": new_backbone, "classifier": new_w},
                batch_stats=new_stats,
                opt_state={"backbone": new_bopt, "classifier_mom": new_mom,
                           "classifier_last": new_last},
            ),
            metrics,
        )

    return train_step
