"""FFC algorithm core: functional twin-network train step over the DCP.

Re-design of the reference ``FFC`` module (/root/reference/ffc.py:10-267) as
a pure function of (state, batch, precomputed indices):

Reference per-step protocol (ffc.py:264-267):
  1. ``forward_impl_rollback(x, y, ...)`` — EMA-update the gallery net, run
     probe(x)/gallery(y), *mutate* the LRU + queue, compute the margin loss
     both against queue row 0 and against the parity-blended queue, then
     *undo every mutation* (ffc.py:255-259) so that…
  2. ``forward_impl(y, x, ...)`` — the mirrored direction sees the same
     pre-update pool state, this time persisting its mutations.

The rollback exists only because the reference's queue is a mutable buffer.
Here the queue is a value: each direction scatters its gallery embeddings
into its *own* functional copy (``queue.at[rows, cols].set(g)``), both
directions read the same input state by construction, and only direction B's
queue is returned as the new state. Rollback disappears; step equivalence to
the reference protocol is proven in tests/test_ffc_step.py.

The LRU bookkeeping (which slots, which of the 2 parity rows, which samples
are pool hits, pool-local labels) arrives as small integer tensors planned
one step ahead by the host (core/dcp.py) — deleting the reference's two
device→host ``.tolist()`` syncs per step (ffc.py:160,190).
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from vlsfr_tpu.config import Config
from vlsfr_tpu.core.dcp import StepIndices
from vlsfr_tpu.ops.margin import add_margin, default_hard_neg


class FFCState(struct.PyTreeNode):
    """Complete on-device training state (checkpointable as one pytree)."""

    step: jnp.ndarray  # scalar int32, global step
    probe_params: Any
    probe_stats: Any  # BN running stats
    gallery_params: Any  # EMA copy of probe_params (ffc.py:53-55,139-145)
    gallery_stats: Any
    queue: jnp.ndarray  # [2, Q, D] L2-normalized rows (ffc.py:29-30)
    opt_state: Any
    # [2, Q] per-row dequant scales when queue_dtype == "int8"
    # (ops/qqueue.py), None for float queues
    queue_scales: Any = None


def init_queue(
    rng: jax.Array, queue_size: int, feat_dim: int, dtype=jnp.float32
):
    """Random init + L2 normalization over features (ffc.py:29-30).

    Uses uniform[0,1) like the reference's ``torch.rand``. Built under jit
    so XLA fuses generate→normalize→cast: eager evaluation would
    materialize two fp32 copies — 16 GB of transient HBM at a 2M-slot
    bf16 queue, an instant OOM on a 16 GB chip.

    Returns ``(queue, scales)``; ``scales`` is the [2, Q] per-row dequant
    array for int8 storage (ops/qqueue.py), None for float dtypes."""
    int8 = jnp.dtype(dtype) == jnp.int8

    @partial(jax.jit, static_argnums=(1, 2, 3))
    def build(key, q, d, dt):
        x = jax.random.uniform(key, (2, q, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        if int8:
            from vlsfr_tpu.ops.qqueue import quantize_rows

            return quantize_rows(x)
        return x.astype(dt), None

    return build(rng, queue_size, feat_dim, jnp.dtype(dtype))


def scatter_mask(seen: jnp.ndarray, cols: jnp.ndarray, queue_size: int) -> jnp.ndarray:
    """[Q] blend mask: 1 where any batch sample hit that slot.

    Device-side build of the reference's ``ones_idx``/``mask`` buffer
    (ffc.py:176,197-201); max-scatter so duplicate slots stay 1.
    """
    mask = jnp.zeros((queue_size,), jnp.float32)
    return mask.at[cols].max(seen)


def directional_loss(
    p: jnp.ndarray,
    g: jnp.ndarray,
    queue: jnp.ndarray,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    seen: jnp.ndarray,
    fake_labels: jnp.ndarray,
    *,
    loss_type: str,
    margin: float,
    scale: float,
    hard_neg: int,
    mask_svfc: float = 1.2,
    use_fused: bool = False,
    sharded_loss_fn=None,
    defer_scatter: bool = False,
    with_acc: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One direction: write gallery embeddings, score probe against both
    queue views, sum the two margin losses (reference ffc.py:180-202).

    Returns (loss, updated_queue). Pure — the caller decides persistence.
    With ``use_fused``, the cosine×margin×CE runs through the twin
    streaming composition and never materializes [B, Q] logits or a
    blended [Q, D] view: single-shard via the twin Pallas kernels
    (ops/twin_margin.py), model-sharded via ``sharded_loss_fn``
    (parallel/sharded_twin.py — signature (p, q0, q1, g, rows, cols, seen,
    labels)). With ``defer_scatter`` (any fused path — the dense path must
    materialize the written queue for the blend view), the persistence
    scatter is NOT built here; the second element is the write plan
    ``(g, rows, cols)`` for the caller to apply OUTSIDE the autodiff
    region (see make_train_step): a scatter inside the grad region forces
    XLA to copy the whole queue, because the twin backward still reads the
    pre-write value (a measured 6.5 ms/step full [2, Q, D] copy at Q=1M
    bf16)."""
    g = jax.lax.stop_gradient(g)
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, hard_neg=hard_neg,
              mask_svfc=mask_svfc)
    if use_fused:
        # fused path: BOTH views in one twin streaming composition with this
        # step's queue writes applied IN-REGISTER — no scattered copy, no
        # blended [Q, D] copy, no queue gradient. Single shard runs the twin
        # Pallas kernels (ops/twin_margin.py); with a model axis > 1 the
        # queue stays row-sharded and the same composition runs per shard
        # with collective logsumexp/top-k merges (parallel/sharded_twin.py).
        # The only queue materialization left is the persistence scatter
        # (B rows) — deferred to after the backward when ``defer_scatter``
        # so it runs in place under donation.
        if sharded_loss_fn is not None:
            # full [2, Q, D] queue — the composition's Pallas kernels take
            # the local [2, Q/m, D] block whole (plane slices at a
            # custom-call site would materialize [Q/m, D] copies; see
            # twin_margin._gather_plane)
            out = sharded_loss_fn(p, queue, g, rows, cols, seen, fake_labels)
            # with_acc must be set in LOCKSTEP with the sharded fn's own
            # with_acc (make_sharded_twin_loss / make_sharded_quad_loss
            # default to a bare scalar): fail loudly at trace time instead
            # of unpacking a 0-d array below.
            if with_acc and not isinstance(out, tuple):
                raise TypeError(
                    "with_acc=True but sharded_loss_fn returned a bare loss "
                    "— construct it with with_acc=True as well "
                    "(parallel/sharded_twin.py, sharded_quad.py)")
        else:
            from vlsfr_tpu.ops.twin_margin import twin_add_margin

            # full [2, Q, D] queue — plane slices at the call site would
            # each materialize a [Q, D] copy as custom-call operands (the
            # measured q=4M OOM; see twin_margin._gather_plane)
            out = twin_add_margin(p, queue, g, rows, cols, seen,
                                  fake_labels, with_acc=with_acc, **kw)
        loss, acc = out if with_acc else (out, None)
        if defer_scatter:
            new_queue = (g, rows, cols)
        else:
            new_queue = queue.at[rows, cols].set(g.astype(queue.dtype))
        return (loss, new_queue, acc) if with_acc else (loss, new_queue)

    # dense path (small queues): materialized scatter + blend + [B, Q]
    # logits; under a mesh GSPMD shards the einsum (queue columns local)
    new_queue = queue.at[rows, cols].set(g.astype(queue.dtype))
    q = queue.shape[1]
    # view 2 weights: parity blend — slots hit this step read row 1
    # (ffc.py:197-201); view 1 is row 0 (ffc.py:195)
    mask = scatter_mask(seen, cols, q)[:, None]
    weight = jax.lax.stop_gradient(mask * new_queue[1] + (1.0 - mask) * new_queue[0])
    cos1 = jnp.einsum("bd,qd->bq", p, new_queue[0], preferred_element_type=jnp.float32)
    cos2 = jnp.einsum("bd,qd->bq", p, weight, preferred_element_type=jnp.float32)
    loss = add_margin(cos1, fake_labels, **kw) + add_margin(cos2, fake_labels, **kw)
    if with_acc:
        # top-1 over the materialized view-1 logits (free on this path)
        pos = fake_labels >= 0
        gt = jnp.take_along_axis(cos1, jnp.maximum(fake_labels, 0)[:, None],
                                 axis=1)[:, 0]
        hit = (gt >= jnp.max(cos1, axis=1)) & pos
        acc = jnp.sum(hit.astype(jnp.float32)) / jnp.maximum(
            jnp.sum(pos.astype(jnp.float32)), 1.0)
        return loss, new_queue, acc
    return loss, new_queue


def make_ffc_loss_fn(model, cfg: Config, mesh=None) -> Callable:
    """Build the pure loss over one combined FFC step.

    ``model`` is the backbone flax Module (probe and gallery share it).
    Returns  fn(probe_params, state, x, y, idx) ->
    (loss, (new_queue, new_probe_stats, new_gallery_stats, metrics)).
    With a mesh whose model axis > 1 and streaming enabled, the twin cosine
    heads run through the sharded twin composition (queue sharded on its
    class axis; parallel/sharded_twin.py).
    """
    hard_neg = cfg.pool.hard_neg if cfg.pool.hard_neg > 0 else default_hard_neg(cfg.pool.queue_size)
    if cfg.pool.use_fused == "auto":
        use_fused = cfg.pool.queue_size >= cfg.pool.streaming_threshold
    else:
        use_fused = cfg.pool.use_fused == "on"
    if cfg.pool.queue_dtype == "int8" and not use_fused:
        raise ValueError(
            "queue_dtype=int8 requires the fused streaming head (the dense "
            "path materializes blended [Q, D] copies the int8 layout exists "
            "to avoid) — set pool.use_fused='on' or raise queue_size past "
            "pool.streaming_threshold")
    int8_compute = cfg.pool.queue_int8_compute
    if int8_compute and cfg.pool.queue_dtype != "int8":
        raise ValueError(
            "pool.queue_int8_compute requires pool.queue_dtype='int8'")
    sharded = use_fused and mesh is not None and (
        mesh.shape.get("model", 1) > 1 or cfg.pool.force_sharded)
    sharded_quad_fn = None
    # every fused path (single-shard kernels AND the sharded compositions)
    # defers the persistence scatter to after the backward
    fused_defer = use_fused
    # quad (both-directions-one-pass) route for every fused config —
    # single-shard via ops/twin_margin.py quad kernels, model-sharded via
    # parallel/sharded_quad.py (same 2-passes-per-step queue traffic per
    # shard). 1024-wide tiles measured faster than 512 (q=1M f32: 118.6 vs
    # 120.2 ms — fewer grid steps; the q1 removal freed the VMEM) but only
    # when the queue divides evenly — _pad_queue would otherwise COPY the
    # whole [2, Q, D] array to pad the class axis (single-shard; per-shard
    # the partial wrappers re-fit the tile to the local axis, _fit_tile).
    use_quad = fused_defer
    if cfg.pool.queue_tile > 0:
        quad_tile = cfg.pool.queue_tile
        if cfg.pool.queue_size % quad_tile != 0:
            raise ValueError(
                f"pool.queue_tile={quad_tile} must divide "
                f"pool.queue_size={cfg.pool.queue_size}")
    else:
        # auto: request a generous tile and let the kernels' VMEM clamp
        # (ops/twin_margin._twin_tile, itemsize-aware) and divisor fit
        # (_fit_tile) decide. f32/bf16 queues clamp to 1024 as before;
        # int8 queues admit 1280-wide tiles at 1024-indivisible-but-
        # 1280-divisible sizes like 10x2^20 (measured +1.3-1.6% at
        # 10.5M slots, docs/PERF.md round 3 int8-compute ladder).
        quad_tile = 2048 if cfg.pool.queue_size % 1024 == 0 else 512
    if use_quad and cfg.pool.queue_size >= (1 << 20) \
            and cfg.pool.queue_size % 1024 != 0:
        import logging

        # _fit_tile falls back to the largest 128-multiple DIVISOR of the
        # class axis; a queue like 10,000,000 (= 128 × 5^7) only divides
        # 128 — 8x the grid steps, measured 2.6x the step time at 10M
        # slots (docs/PERF.md round 3). Padding instead would copy the
        # whole [2, Q, D] array per pass.
        logging.getLogger("vlsfr").warning(
            "pool.queue_size=%d is not a multiple of 1024; the fused head's "
            "tile drops to the largest dividing 128-multiple, which can "
            "cost >2x at multi-million queues — round the queue size to a "
            "multiple of 1024 (e.g. %d)", cfg.pool.queue_size,
            -(-cfg.pool.queue_size // 1024) * 1024)
    if sharded:
        from vlsfr_tpu.parallel.sharded_quad import make_sharded_quad_loss

        sharded_quad_fn = make_sharded_quad_loss(
            mesh,
            loss_type=cfg.loss.loss_type,
            margin=cfg.loss.margin,
            scale=cfg.loss.scale,
            hard_neg=hard_neg,
            mask_svfc=cfg.loss.mask_svfc,
            tile=quad_tile,
            with_acc=True,
            int8_compute=int8_compute,
        )
    loss_kw = dict(
        loss_type=cfg.loss.loss_type,
        margin=cfg.loss.margin,
        scale=cfg.loss.scale,
        hard_neg=hard_neg,
        mask_svfc=cfg.loss.mask_svfc,
        use_fused=use_fused,
        with_acc=True,
    )
    m = cfg.pool.momentum
    fuse_fwd = cfg.pool.fuse_forward
    gallery_int8 = cfg.pool.gallery_int8

    def loss_fn(probe_params, state: FFCState, x, y, idx: StepIndices):
        # EMA gallery update happens once, before any gallery forward
        # (ffc.py:211: only the first pass updates; both passes then use it)
        gallery_params = jax.tree.map(
            lambda g_, p_: m * g_ + (1.0 - m) * jax.lax.stop_gradient(p_),
            state.gallery_params,
            probe_params,
        )

        def probe_fwd(data, stats):
            out, mut = model.apply(
                {"params": probe_params, "batch_stats": stats},
                data, train=True, mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]

        def gallery_fwd(data, stats):
            if gallery_int8:
                # int8×int8→int32 convs for the no-gradient EMA forward
                # (ops/quant.py; flag cfg.pool.gallery_int8) — trace-time
                # context, the param tree is untouched
                from vlsfr_tpu.ops.quant import int8_conv_inference
                ctx = int8_conv_inference()
            else:
                ctx = contextlib.nullcontext()
            with ctx:
                out, mut = model.apply(
                    {"params": gallery_params, "batch_stats": stats},
                    data, train=True, mutable=["batch_stats"],
                )
            return jax.lax.stop_gradient(out), jax.tree.map(jax.lax.stop_gradient, mut["batch_stats"])

        if fuse_fwd:
            # perf mode: one 2B-batch forward per net instead of two B-batch
            # forwards — larger per-op batch for the MXU, half the kernel
            # launches. BN batch statistics are then computed over 2B samples
            # (the reference computes them per B-batch pass); training-
            # dynamics-equivalent but not bit-equivalent to the reference.
            b = x.shape[0]
            p_xy, probe_stats = probe_fwd(jnp.concatenate([x, y]), state.probe_stats)
            g_yx, gallery_stats = gallery_fwd(jnp.concatenate([y, x]), state.gallery_stats)
            p_x, p_y = p_xy[:b], p_xy[b:]
            g_y, g_x = g_yx[:b], g_yx[b:]
        else:
            # forward order mirrors the reference: pass A = probe(x)/gallery(y),
            # pass B = probe(y)/gallery(x) (ffc.py:209-212,157-159)
            p_x, probe_stats = probe_fwd(x, state.probe_stats)
            g_y, gallery_stats = gallery_fwd(y, state.gallery_stats)
            p_y, probe_stats = probe_fwd(y, probe_stats)
            g_x, gallery_stats = gallery_fwd(x, gallery_stats)

        if use_quad:
            # fused: BOTH directions in ONE streaming pass over q0 per
            # fwd/bwd — two twin calls read the same pre-update queue
            # 4×/step. Single-shard via ops/twin_margin.py quad kernels
            # (shared-stream bodies for Arc/AM: one negative logsumexp per
            # direction, per-view target terms analytic — wins at every
            # measured config on v5e ir50 b128: q=1M f32 120.2 ms vs 123.5
            # twin; q=4M bf16 151.3 vs 153.3); model-sharded via the quad
            # partial kernels + collective merges
            # (parallel/sharded_quad.py). ``new_queue`` is direction B's
            # write plan, applied by make_train_step AFTER the backward
            # (in-place under donation).
            g_yd = jax.lax.stop_gradient(g_y)
            g_xd = jax.lax.stop_gradient(g_x)
            if sharded_quad_fn is not None:
                (loss_a, loss_b), train_acc = sharded_quad_fn(
                    p_x, p_y, state.queue, g_yd, g_xd,
                    (idx.a.rows, idx.a.cols, idx.a.seen),
                    (idx.b.rows, idx.b.cols, idx.b.seen),
                    idx.a.fake_labels, idx.b.fake_labels,
                    qscales=state.queue_scales,
                )
            else:
                from vlsfr_tpu.ops.twin_margin import quad_add_margin

                (loss_a, loss_b), train_acc = quad_add_margin(
                    p_x, p_y, state.queue, g_yd, g_xd,
                    (idx.a.rows, idx.a.cols, idx.a.seen),
                    (idx.b.rows, idx.b.cols, idx.b.seen),
                    idx.a.fake_labels, idx.b.fake_labels,
                    loss_type=loss_kw["loss_type"], margin=loss_kw["margin"],
                    scale=loss_kw["scale"], hard_neg=loss_kw["hard_neg"],
                    mask_svfc=loss_kw["mask_svfc"], tile=quad_tile,
                    with_acc=True, qscales=state.queue_scales,
                    int8_compute=int8_compute,
                )
            new_queue = (g_xd, idx.b.rows, idx.b.cols)
        else:
            # direction A (the reference's rollback pass): functional,
            # discarded
            loss_a, _, acc_a = directional_loss(
                p_x, g_y, state.queue, idx.a.rows, idx.a.cols, idx.a.seen,
                idx.a.fake_labels, defer_scatter=fused_defer, **loss_kw,
            )
            # direction B: persists (as the deferred write plan when fused)
            loss_b, new_queue, acc_b = directional_loss(
                p_y, g_x, state.queue, idx.b.rows, idx.b.cols, idx.b.seen,
                idx.b.fake_labels, defer_scatter=fused_defer, **loss_kw,
            )
            train_acc = (acc_a + acc_b) / 2
        loss = loss_a + loss_b
        metrics = {
            "loss": loss,
            "loss_dir_a": loss_a,
            "loss_dir_b": loss_b,
            # streaming top-1 over in-pool rows (view 1) — free from the
            # twin/quad kernels' running top-k (round-2 verdict item 6)
            "train_acc": train_acc,
            "pool_hit_rate": (jnp.mean(idx.a.seen) + jnp.mean(idx.b.seen)) / 2,
            "outlier_frac": jnp.mean((idx.a.fake_labels < 0).astype(jnp.float32)),
        }
        return loss, (new_queue, probe_stats, gallery_stats, gallery_params, metrics)

    return loss_fn


def make_train_step(model, cfg: Config, optimizer, schedule, mesh=None) -> Callable:
    """Jittable train step: grads → optax update → new FFCState.

    ``schedule(step) * lr_scale`` sets the injected learning rate
    (lr_scale carries the host-side plateau factor).
    """
    loss_fn = make_ffc_loss_fn(model, cfg, mesh=mesh)

    def train_step(state: FFCState, x, y, idx: StepIndices, lr_scale):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_queue, probe_stats, gallery_stats, gallery_params, metrics)), grads = grad_fn(
            state.probe_params, state, x, y, idx
        )
        new_scales = state.queue_scales
        if isinstance(new_queue, tuple):
            # deferred persistence scatter (fused single-shard path): the
            # optimization_barrier orders the write after the backward — at
            # that point the pre-write queue is dead, so under donation the
            # B-row scatter is an in-place dynamic-update-slice instead of a
            # full [2, Q, D] copy (measured 6.5 ms/step at Q=1M bf16).
            g_b, rows_b, cols_b = new_queue
            queue_dead, _ = jax.lax.optimization_barrier(
                (state.queue, jax.tree.leaves(grads)[0])
            )
            if queue_dead.dtype == jnp.int8:
                # int8 storage: each admission re-quantizes the fresh
                # gallery embedding whole (ops/qqueue.py) — rounding never
                # accumulates across steps
                from vlsfr_tpu.ops.qqueue import quantize_rows

                q_rows, s_rows = quantize_rows(g_b)
                new_queue = queue_dead.at[rows_b, cols_b].set(q_rows)
                new_scales = new_scales.at[rows_b, cols_b].set(s_rows)
            else:
                new_queue = queue_dead.at[rows_b, cols_b].set(
                    g_b.astype(queue_dead.dtype))
        lr = schedule(state.step) * lr_scale
        state.opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.probe_params)
        new_params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), state.probe_params, updates)
        metrics = dict(metrics, lr=lr, grad_norm=optax_global_norm(grads))
        new_state = state.replace(
            step=state.step + 1,
            probe_params=new_params,
            probe_stats=probe_stats,
            gallery_params=gallery_params,
            gallery_stats=gallery_stats,
            queue=new_queue,
            opt_state=new_opt_state,
            queue_scales=new_scales,
        )
        return new_state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree)))


def create_ffc_state(
    rng: jax.Array, model, cfg: Config, optimizer, image_size: int
) -> FFCState:
    """Initialize probe/gallery (gallery = copy of probe, ffc.py:53-55),
    queue, and optimizer state."""
    k_model, k_queue = jax.random.split(rng)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(k_model, dummy, train=False)
    probe_params = variables["params"]
    probe_stats = variables.get("batch_stats", {})
    queue, queue_scales = init_queue(
        k_queue, cfg.pool.queue_size, cfg.model.feat_dim,
        jnp.dtype(cfg.pool.queue_dtype))
    return FFCState(
        step=jnp.zeros((), jnp.int32),
        probe_params=probe_params,
        probe_stats=probe_stats,
        gallery_params=jax.tree.map(jnp.copy, probe_params),
        gallery_stats=jax.tree.map(jnp.copy, probe_stats),
        queue=queue,
        opt_state=optimizer.init(probe_params),
        queue_scales=queue_scales,
    )
