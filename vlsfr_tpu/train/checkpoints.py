"""Checkpoint save/restore with real resume.

The reference saves a partial snapshot every 1000 iters (probe state_dict,
LRU kv list, queue, parity dict — main.py:76-85) but has **no load path at
all**: ``--pretrained_model_path`` is parsed and ignored, ``LRU.restore`` is
dead code (SURVEY.md C16). Here the FULL training state round-trips:

* device pytree (FFCState: probe/gallery params+stats, queue, optimizer
  state, step) via orbax (async-capable, sharding-aware);
* host state (DCP LRU + parity, plateau controller, data position) as a
  JSON/npz sidecar in the same step directory, saved atomically with it.

Layout:  <dir>/<step>/state/...   (orbax)
         <dir>/<step>/host.npz    (LRU keys/slots, parity, plateau, rng info)
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import orbax.checkpoint as ocp

from vlsfr_tpu.core.dcp import DCPManager


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    # ------------------------------------------------------------------
    def save(self, step: int, state, dcp: DCPManager | None, host_extra: dict | None = None):
        """Save device state via orbax + host sidecar. Returns when queued
        (async); call wait() to block."""
        self._mngr.save(step, args=ocp.args.Composite(state=ocp.args.StandardSave(state)))
        host: dict[str, Any] = dict(host_extra or {})
        if dcp is not None:
            kvs = dcp.state_dict()
            lru = np.asarray(kvs["lru"], dtype=np.int64).reshape(-1, 2)
            host["lru_keys"] = lru[:, 0]
            host["lru_slots"] = lru[:, 1]
            host["parity"] = kvs["parity"]
            host["queue_size"] = np.asarray(kvs["queue_size"])
        np.savez(self._host_path(step), **{k: np.asarray(v) for k, v in host.items()})
        self._gc_host_sidecars()

    def _gc_host_sidecars(self):
        """Drop host sidecars whose orbax step was rotated out."""
        import glob

        live = set(self._mngr.all_steps())
        for p in glob.glob(os.path.join(self.directory, "host_*.npz")):
            try:
                step = int(os.path.basename(p)[5:-4])
            except ValueError:
                continue
            if step not in live:
                try:
                    os.remove(p)
                except OSError:
                    pass

    def wait(self):
        self._mngr.wait_until_finished()

    def _host_path(self, step: int) -> str:
        return os.path.join(self.directory, f"host_{step}.npz")

    # ------------------------------------------------------------------
    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def restore(self, step: int, abstract_state, dcp: DCPManager | None):
        """Restore device state shaped/sharded like ``abstract_state``;
        repopulate the DCP manager in place. Returns (state, host_extra)."""
        restored = self._mngr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(abstract_state))
        )["state"]
        host_extra: dict[str, Any] = {}
        hp = self._host_path(step)
        if os.path.exists(hp):
            data = np.load(hp)
            if dcp is not None and "lru_keys" in data:
                kvs = list(zip(data["lru_keys"].tolist(), data["lru_slots"].tolist()))
                dcp.restore(
                    {"lru": kvs, "parity": data["parity"], "queue_size": int(data["queue_size"])}
                )
            host_extra = {
                k: data[k]
                for k in data.files
                if k not in ("lru_keys", "lru_slots", "parity", "queue_size")
            }
        return restored, host_extra

    def close(self):
        self._mngr.close()
