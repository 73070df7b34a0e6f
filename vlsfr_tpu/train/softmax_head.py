"""Full-softmax margin-classifier training (BASELINE configs 1-2).

The reference trains ONLY through the FFC/DCP head; a dense ArcFace
classifier is the natural baseline it compares against (and the first
end-to-end slice per SURVEY.md §7 stage 4). One network, one classifier
matrix [num_classes, feat_dim] (shardable over the mesh ``model`` axis via
parallel/partial_fc.py), margin-softmax CE from the shared ops.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from vlsfr_tpu.config import Config
from vlsfr_tpu.parallel.partial_fc import margin_softmax_loss


class SoftmaxState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # {"backbone": ..., "classifier": [C, D]}
    batch_stats: Any
    opt_state: Any


def create_softmax_state(
    rng: jax.Array, model, cfg: Config, optimizer, image_size: int, num_classes: int
) -> SoftmaxState:
    k_model, k_w = jax.random.split(rng)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(k_model, dummy, train=False)
    params = {
        "backbone": variables["params"],
        # ArcFace-style classifier init: small normal; rows are re-normalized
        # every forward so only direction matters
        "classifier": jax.random.normal(k_w, (num_classes, cfg.model.feat_dim), jnp.float32)
        * 0.01,
    }
    if cfg.pool.sample_rate > 0 and cfg.pool.sparse_update:
        # sparse-classifier mode: optax only owns the backbone; the
        # classifier gets a bare momentum buffer (train/sparse_classifier.py)
        opt_state = {
            "backbone": optimizer.init(params["backbone"]),
            "classifier_mom": jnp.zeros_like(params["classifier"]),
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
    if cfg.pool.use_fused == "auto":
        streaming = cfg.pool.num_classes >= cfg.pool.streaming_threshold
    else:
        streaming = cfg.pool.use_fused == "on"
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
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
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
        b = labels.shape[0]
        key = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        rand = jax.random.randint(key, (num_sampled - b,), 0, c)
        sampled = jnp.concatenate([labels.astype(jnp.int32), rand.astype(jnp.int32)])
        local_labels = jnp.arange(b, dtype=jnp.int32)
        w_sub = state.params["classifier"][sampled]

        def loss_fn(backbone_params, w_sub_, batch_stats):
            emb, mut = model.apply(
                {"params": backbone_params, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            loss, metrics = margin_softmax_loss(emb, w_sub_, local_labels, **loss_kw)
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
            new_backbone = jax.tree.map(lambda p, u: p + u, state.params["backbone"], upd_b)
            new_w, new_mom = sparse_sgd_rows(
                state.params["classifier"], state.opt_state["classifier_mom"],
                sampled, g_wsub,
                lr=lr, momentum=cfg.optim.momentum,
                weight_decay=cfg.optim.weight_decay, nesterov=cfg.optim.nesterov,
            )
            new_params = {"backbone": new_backbone, "classifier": new_w}
            new_opt = {"backbone": new_bopt, "classifier_mom": new_mom}
        else:
            # dense optimizer: scatter the sampled grads into a full [C, D]
            # gradient (rows not sampled get exact zeros)
            g_full = jnp.zeros_like(state.params["classifier"]).at[sampled].add(g_wsub)
            grads = {"backbone": g_backbone, "classifier": g_full}
            state.opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        return (
            state.replace(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt),
            metrics,
        )

    return train_step
