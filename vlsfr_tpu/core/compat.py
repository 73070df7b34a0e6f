"""Reference-compatible convenience API.

``FFC`` mirrors the reference module's constructor signature exactly
(/root/reference/ffc.py:11-12) so reference users can port call sites with
minimal edits:

    net = FFC(net_type, feat_dim, queue_size, scale, loss_type, margin,
              momentum, neg_margin, pretrained_model_path, num_class)
    loss = net.train_step(x, y, x_label, y_label)   # full optimizer step
    emb  = net.embed(images)                        # probe embeddings

Differences from the reference (deliberate):

* ``train_step`` performs the whole update (forward + backward + SGD) —
  JAX has no imperative autograd tape to hand back, and the reference's
  ``loss.backward(); optimizer.step()`` always follows its forward anyway.
* Inputs may be NCHW (reference convention) or NHWC (TPU convention);
  NCHW is detected and transposed.
* ``pretrained_model_path`` actually works (the reference ignores it).

For production training use vlsfr_tpu.train.Trainer (sharding, prefetch,
checkpointing); this class is the small-API on-ramp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vlsfr_tpu.config import Config
from vlsfr_tpu.core.dcp_native import create_dcp_manager
from vlsfr_tpu.core.ffc import create_ffc_state, make_train_step
from vlsfr_tpu.models import create_net, native_image_size
from vlsfr_tpu.optim import make_optimizer, make_schedule


class FFC:
    def __init__(self, net_type: str, feat_dim: int, queue_size: int = 7409,
                 scale: float = 32.0, loss_type: str = "AM", margin: float = 0.4,
                 momentum: float = 0.99, neg_margin: float = 0.25,
                 pretrained_model_path: str | None = None, num_class: int | None = None,
                 lr: float = 0.1, seed: int = 0):
        assert loss_type in ("AM", "Arc", "SV")
        cfg = Config()
        cfg.model.net_type = net_type
        cfg.model.feat_dim = feat_dim
        cfg.pool.queue_size = queue_size
        cfg.pool.momentum = momentum
        cfg.pool.num_classes = num_class or 0
        cfg.loss.loss_type = loss_type
        cfg.loss.margin = margin
        cfg.loss.scale = scale
        cfg.loss.neg_margin = neg_margin
        cfg.optim.lr = lr
        self.cfg = cfg
        self.image_size = native_image_size(net_type)
        self.model = create_net(net_type, feat_dim=feat_dim, dtype=cfg.model.dtype)
        self.optimizer = make_optimizer(cfg.optim)
        self.schedule = make_schedule(cfg.optim, steps_per_epoch=1000)
        self.state = create_ffc_state(
            jax.random.PRNGKey(seed), self.model, cfg, self.optimizer, self.image_size
        )
        if pretrained_model_path:
            from vlsfr_tpu.train.pretrained import apply_pretrained, load_pretrained_backbone

            self.state = apply_pretrained(
                self.state, load_pretrained_backbone(pretrained_model_path, net_type, feat_dim)
            )
        self.dcp = create_dcp_manager(queue_size)
        self._step = jax.jit(
            make_train_step(self.model, cfg, self.optimizer, self.schedule), donate_argnums=0
        )
        self._embed = jax.jit(
            lambda params, stats, im: self.model.apply(
                {"params": params, "batch_stats": stats}, im, train=False
            )
        )

    # ------------------------------------------------------------------
    def _to_nhwc(self, a) -> jnp.ndarray:
        a = np.asarray(a, dtype=np.float32)
        if a.ndim == 4 and a.shape[1] == 3 and a.shape[-1] != 3:
            a = a.transpose(0, 2, 3, 1)  # reference NCHW → NHWC
        return jnp.asarray(a)

    def train_step(self, x, y, x_label, y_label) -> float:
        """One full FFC optimization step (reference forward + backward +
        optimizer.step, main.py:56-71 + ffc.py:264-267). Returns the loss."""
        idx = self.dcp.plan_step(np.asarray(x_label), np.asarray(y_label))
        self.state, metrics = self._step(
            self.state, self._to_nhwc(x), self._to_nhwc(y), idx, 1.0
        )
        return float(metrics["loss"])

    forward = train_step  # closest analogue of the reference call surface
    __call__ = train_step

    def embed(self, images) -> np.ndarray:
        """probe_net(images) → L2-normalized embeddings (the reference's
        de-facto inference surface, SURVEY.md §3.5)."""
        return np.asarray(
            self._embed(self.state.probe_params, self.state.probe_stats, self._to_nhwc(images))
        )

    @property
    def queue(self) -> np.ndarray:
        return np.asarray(self.state.queue)

    @property
    def lru(self):
        return self.dcp.lru if hasattr(self.dcp, "lru") else self.dcp

    def state_dict(self) -> dict:
        """Reference checkpoint layout (main.py:85): probe params, LRU kvs,
        queue, parity."""
        d = self.dcp.state_dict()
        return {
            "state_dict": jax.tree.map(np.asarray, self.state.probe_params),
            "lru": d["lru"],
            "fc": self.queue,
            "qp": {int(i): int(p) for i, p in enumerate(d["parity"])},
        }
