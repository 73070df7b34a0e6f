"""Training orchestrator.

Replaces the reference's ``train`` / ``train_one_epoch``
(/root/reference/main.py:23-143) with a mesh-aware, checkpoint/resume-capable
loop. Differences that matter (all deliberate, per SURVEY.md §7):

* One jitted step serves both heads: ``ffc`` (DCP pool, twin nets) or
  ``full_softmax`` (dense/partial-FC classifier).
* LR scheduling is inside the step (traced schedule); only the plateau
  controller runs host-side, feeding a scalar ``lr_scale``.
* DCP planning happens on the host in step order (core/dcp.py), so the
  device step never syncs back (the reference's ``.tolist()`` pattern).
* Full resume: device pytree + DCP/plateau/data-position sidecar, observed
  at the reference's cadence knobs (--print_freq/--save_freq ≙ main.py:76).
  Plateau LR observations happen once per print window (the reference
  observes per step); with the reference default print_freq=1000 the
  windowed mean is a lower-variance version of the same signal.
* The frozen gallery net never reaches the optimizer (the reference
  optimizes it by accident, main.py:126).
"""

from __future__ import annotations

import jax
import numpy as np

from vlsfr_tpu.config import Config
from vlsfr_tpu.core.dcp_native import create_dcp_manager
from vlsfr_tpu.core.ffc import create_ffc_state, make_train_step
from vlsfr_tpu.data.pipeline import FFCPipeline, InstancePipeline
from vlsfr_tpu.data.records import MultiSourceReader
from vlsfr_tpu.models import create_net, native_image_size
from vlsfr_tpu.optim import PlateauController, make_optimizer, make_schedule
from vlsfr_tpu.parallel.mesh import batch_sharding, make_mesh, queue_sharding, replicated
from vlsfr_tpu.train.checkpoints import CheckpointManager
from vlsfr_tpu.train.softmax_head import create_softmax_state, make_softmax_train_step
from vlsfr_tpu.utils.metrics import MetricsLogger, Throughput, logger


def _enable_compile_cache():
    """Persistent XLA compile cache for every Trainer process. ir50-sized
    training graphs take 5-10 minutes to compile through a TPU tunnel;
    without this, every CLI/tool invocation repays that in full (bench.py
    always set it, the trainer path never did — round-4's accuracy rows
    each burned ~8 idle minutes recompiling identical graphs). JAX only
    persists compilations above ~1 s, so CPU test graphs don't churn the
    cache. Opt out with VLSFR_COMPILE_CACHE=''."""
    import os

    cache = os.environ.get("VLSFR_COMPILE_CACHE",
                           os.path.expanduser("~/.vlsfr_jax_cache"))
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)


class Trainer:
    def __init__(self, cfg: Config, reader: MultiSourceReader | None = None):
        self.cfg = cfg
        _enable_compile_cache()
        self.mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.image_size = cfg.data.image_size or native_image_size(cfg.model.net_type)

        if reader is None:
            if cfg.data.synthetic:
                import tempfile

                from vlsfr_tpu.data.synthetic import generate_synthetic_store

                d = tempfile.mkdtemp(prefix="vlsfr_syn_")
                generate_synthetic_store(
                    d,
                    num_ids=cfg.data.synthetic_ids,
                    images_per_id=cfg.data.synthetic_images_per_id,
                    image_size=self.image_size,
                    seed=cfg.data.seed,
                    hard=cfg.data.synthetic_hard,
                )
                cfg.data.sources = [d]
            reader = MultiSourceReader(cfg.data.sources)
        self.reader = reader

        self.model = create_net(
            cfg.model.net_type,
            feat_dim=cfg.model.feat_dim,
            dtype=cfg.model.dtype,
            dropout=cfg.model.dropout,
            bn_stats_rows=cfg.model.bn_stats_rows,
        )
        self.optimizer = make_optimizer(cfg.optim)
        self.plateau = PlateauController(
            patience=cfg.optim.patience, min_lr=cfg.optim.lr_min, base_lr=cfg.optim.lr
        )
        self.metrics = MetricsLogger(cfg.train.log_dir or f"{cfg.train.saved_dir}/logs")
        self.ckpt = CheckpointManager(cfg.train.saved_dir, cfg.train.keep_checkpoints)
        self.num_chips = self.mesh.devices.size

        # multi-host: decode only this host's rows (labels stay global — the
        # replicated DCP planners need every host to see the full label plan)
        host_slice = None
        if jax.process_count() > 1:
            from vlsfr_tpu.parallel.distributed import local_batch_slice

            host_slice = local_batch_slice(cfg.data.batch_size)
        self.is_ffc = cfg.pool.head == "ffc"
        # held-out split: the LAST holdout_records of the store never enter
        # the training streams; evaluate() samples verification pairs there
        self.record_limit = None
        if cfg.train.holdout_records > 0:
            self.record_limit = max(len(reader) - cfg.train.holdout_records,
                                    cfg.data.batch_size)
        if self.is_ffc:
            self.pipeline = FFCPipeline(
                reader,
                cfg.data.batch_size,
                self.image_size,
                seed=cfg.data.seed,
                num_workers=cfg.data.num_workers,
                prefetch=cfg.data.prefetch,
                host_slice=host_slice,
                record_limit=self.record_limit,
            )
            self.dcp = create_dcp_manager(cfg.pool.queue_size)
        else:
            self.pipeline = InstancePipeline(
                reader,
                cfg.data.batch_size,
                self.image_size,
                seed=cfg.data.seed,
                num_workers=cfg.data.num_workers,
                prefetch=cfg.data.prefetch,
                host_slice=host_slice,
                record_limit=self.record_limit,
            )
            self.dcp = None
            if cfg.pool.num_classes <= 0:
                cfg.pool.num_classes = reader.num_class
            m = self.mesh.shape.get("model", 1)
            if cfg.pool.num_classes % m:
                # class axis must divide the model shards; ghost classes are
                # plain extra negatives (never targets) — effect on the CE
                # denominator is O(m / num_classes)
                padded = (cfg.pool.num_classes + m - 1) // m * m
                logger.info("padding num_classes %d -> %d for %d-way class sharding",
                            cfg.pool.num_classes, padded, m)
                cfg.pool.num_classes = padded

        spe = cfg.train.steps_per_epoch or self.pipeline.steps_per_epoch()
        self.steps_per_epoch = max(spe, 1)
        self.schedule = make_schedule(cfg.optim, self.steps_per_epoch)

        self._build_state_and_step()
        self.start_epoch = 0
        self.start_step = 0
        if cfg.train.resume:
            self._maybe_resume()

    # ------------------------------------------------------------------
    def _build_state_and_step(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.data.seed)
        if self.is_ffc:
            state = create_ffc_state(rng, self.model, cfg, self.optimizer, self.image_size)
            step_fn = make_train_step(self.model, cfg, self.optimizer, self.schedule,
                                      mesh=self.mesh)
        else:
            state = create_softmax_state(
                rng, self.model, cfg, self.optimizer, self.image_size,
                cfg.pool.num_classes, mesh=self.mesh,
            )
            step_fn = make_softmax_train_step(
                self.model, cfg, self.optimizer, self.schedule, mesh=self.mesh
            )
        if cfg.train.pretrained_model_path:
            from vlsfr_tpu.train.pretrained import apply_pretrained, load_pretrained_backbone

            variables = load_pretrained_backbone(
                cfg.train.pretrained_model_path, cfg.model.net_type, cfg.model.feat_dim
            )
            state = apply_pretrained(state, variables)
            logger.info("loaded pretrained backbone from %s", cfg.train.pretrained_model_path)
        # placement: queue/classifier sharded over 'model', rest replicated
        rep = replicated(self.mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        if self.is_ffc:
            state = state.replace(queue=jax.device_put(state.queue, queue_sharding(self.mesh)))
            if state.queue_scales is not None:
                from vlsfr_tpu.parallel.mesh import queue_scales_sharding

                state = state.replace(queue_scales=jax.device_put(
                    state.queue_scales, queue_scales_sharding(self.mesh)))
        elif cfg.mesh.model > 1:
            from vlsfr_tpu.parallel.mesh import class_vector_sharding, classifier_sharding

            cls_sh = classifier_sharding(self.mesh)
            cls = jax.device_put(state.params["classifier"], cls_sh)
            state = state.replace(params=dict(state.params, classifier=cls))
            if isinstance(state.opt_state, dict) and "classifier_mom" in state.opt_state:
                # sparse-row classifier state rides with its rows
                opt = dict(state.opt_state)
                opt["classifier_mom"] = jax.device_put(opt["classifier_mom"], cls_sh)
                if "classifier_last" in opt:
                    opt["classifier_last"] = jax.device_put(
                        opt["classifier_last"], class_vector_sharding(self.mesh))
                state = state.replace(opt_state=opt)
        self.state = state
        self._step = jax.jit(step_fn, donate_argnums=0)
        self._batch_sharding = batch_sharding(self.mesh)

    # ------------------------------------------------------------------
    def _maybe_resume(self):
        latest = self.ckpt.latest_step()
        if latest is None:
            return
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding), self.state
        )
        self.state, extra = self.ckpt.restore(latest, abstract, self.dcp)
        if "plateau" in extra:
            b, nb, sc = np.asarray(extra["plateau"]).tolist()
            self.plateau.load_state_dict({"best": b, "num_bad": nb, "scale": sc})
        g = int(self.state.step)
        self.start_epoch, self.start_step = divmod(g, self.steps_per_epoch)
        logger.info("resumed from checkpoint step %d (epoch %d, step %d)",
                    g, self.start_epoch, self.start_step)

    def _save(self, global_step: int):
        extra = {
            "plateau": np.asarray(
                [self.plateau.best, float(self.plateau.num_bad), self.plateau.scale]
            )
        }
        self.ckpt.save(global_step, self.state, self.dcp, extra)

    # ------------------------------------------------------------------
    def _device_batch(self, *arrays):
        if jax.process_count() == 1:
            return tuple(jax.device_put(a, self._batch_sharding) for a in arrays)
        # multi-host: the pipeline already decoded ONLY this host's image
        # rows (host_slice); global-sized arrays (labels — every host builds
        # the same deterministic plan) are sliced here. jax glues the
        # per-process shards into one global array view.
        from vlsfr_tpu.parallel.distributed import local_batch_slice

        g = self.cfg.data.batch_size
        sl = local_batch_slice(g)
        out = []
        for a in arrays:
            local = a[sl] if a.shape[0] == g else a
            out.append(jax.make_array_from_process_local_data(self._batch_sharding, local))
        return tuple(out)

    def install_signal_handlers(self):
        """Preemption tolerance: SIGTERM/SIGINT triggers a final checkpoint
        before exit; the next run auto-resumes (the reference has no failure
        handling at all, SURVEY.md §5)."""
        import signal

        def handler(signum, frame):
            logger.warning("signal %d: checkpointing at step %d then exiting",
                           signum, int(self.state.step))
            self._save(int(self.state.step))
            self.ckpt.wait()
            raise SystemExit(128 + signum)

        signal.signal(signal.SIGTERM, handler)
        signal.signal(signal.SIGINT, handler)

    def train(self) -> dict:
        cfg = self.cfg
        thr = Throughput(self.num_chips)
        last_metrics: dict = {}
        # host-side step counter: reading state.step from device would force
        # a sync every iteration and serialize host planning with the device
        gstep = self.start_epoch * self.steps_per_epoch + self.start_step
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            start = self.start_step if epoch == self.start_epoch else 0
            for batch in self.pipeline.epoch_iter(epoch, start_step=start):
                if self.is_ffc:
                    idx = self.dcp.plan_step(batch.x_label, batch.y_label)
                    x, y = self._device_batch(batch.x, batch.y)
                    self.state, m = self._step(self.state, x, y, idx, self.plateau.scale)
                    n_images = batch.x.shape[0] * 2
                else:
                    images, labels = self._device_batch(batch.images, batch.labels)
                    self.state, m = self._step(self.state, images, labels, self.plateau.scale)
                    n_images = batch.images.shape[0]
                thr.update(n_images)
                gstep += 1
                if gstep % cfg.train.print_freq == 0:
                    m = {k: float(v) for k, v in m.items()}  # one sync per window
                    ips, ips_chip = thr.value()
                    self.metrics.log(
                        gstep,
                        dict(m, epoch=epoch, images_per_sec=ips, images_per_sec_chip=ips_chip),
                    )
                    if cfg.optim.scheduler == "plateau":
                        self.plateau.observe(m["loss"])
                    thr.reset()
                    last_metrics = m
                if gstep % cfg.train.save_freq == 0:
                    self._save(gstep)
                if cfg.train.eval_freq and gstep % cfg.train.eval_freq == 0:
                    self.metrics.log(gstep, self.evaluate(), prefix="eval")
        final_step = gstep
        self._save(final_step)
        self.ckpt.wait()
        return dict(last_metrics, final_step=final_step)

    def _eval_variables(self):
        if self.is_ffc:
            if self.cfg.train.eval_use_ema:
                # the EMA gallery net (see TrainConfig.eval_use_ema)
                return {"params": self.state.gallery_params,
                        "batch_stats": self.state.gallery_stats}
            return {"params": self.state.probe_params, "batch_stats": self.state.probe_stats}
        return {
            "params": self.state.params["backbone"],
            "batch_stats": self.state.batch_stats,
        }

    def evaluate(self) -> dict:
        """In-training verification eval (the reference has no eval at all;
        SURVEY.md §3.5). With ``train.holdout_records`` the pairs come from
        the held-out tail of the store (a real accuracy metric); otherwise
        from the train set (smoke signal only). ``train.eval_bin``
        additionally evaluates an insightface-style .bin file."""
        import numpy as _np

        from vlsfr_tpu.eval.extract import Embedder
        from vlsfr_tpu.eval.verification import (
            cosine_scores,
            kfold_verification_accuracy,
            make_verification_pairs,
        )

        cfg = self.cfg
        variables = self._eval_variables()
        if self.record_limit is not None and self.record_limit < len(self.reader):
            pool = _np.arange(self.record_limit, len(self.reader))
            src = "holdout"
        else:
            pool = _np.arange(len(self.reader))
            src = "train"
            if not getattr(self, "_warned_train_eval", False):
                self._warned_train_eval = True
                print("[eval] WARNING: no holdout split configured "
                      "(train.holdout_records=0) — verification pairs are "
                      "sampled from the TRAIN set; the metric is logged as "
                      "verification_acc_train and is a smoke signal only")
        n = min(len(pool), cfg.train.eval_records)
        idx = _np.random.default_rng(cfg.data.seed).choice(pool, n, replace=False)
        labels = _np.asarray([self.reader.label(int(i)) for i in idx])
        emb = Embedder(self.model, variables, batch_size=min(64, n))
        embeddings = emb.from_reader(self.reader, self.image_size, indices=idx)
        try:
            i1, i2, issame = make_verification_pairs(labels, cfg.train.eval_pairs,
                                                     seed=cfg.data.seed)
        except AssertionError:
            return {"verification_acc": float("nan")}
        scores = cosine_scores(embeddings[i1], embeddings[i2])
        acc, std = kfold_verification_accuracy(scores, issame)
        out = {f"verification_acc_{src}": acc, "verification_std": std}
        if cfg.train.eval_bin:
            from vlsfr_tpu.eval.verification import evaluate_bin

            res = evaluate_bin(emb, cfg.train.eval_bin, self.image_size)
            out.update({f"bin_{k}": v for k, v in res.items()})
        return out

    def close(self):
        self.ckpt.wait()
        self.ckpt.close()
        self.pipeline.close()
        self.metrics.close()
