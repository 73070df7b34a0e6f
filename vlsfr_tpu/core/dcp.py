"""Host-side Dynamic Class Pool manager.

The reference interleaves Python LRU bookkeeping with device compute inside
``FFC.forward`` (/root/reference/ffc.py:153-260), forcing two device→host
syncs per step (``.tolist()`` at ffc.py:160,190) and a mutate-then-rollback
dance so that both directional passes observe the same pre-update pool state
(ffc.py:208-260, lru.py:157-255).

The rebuild hoists ALL of that onto the host, ahead of the device step: the
input pipeline calls :meth:`DCPManager.plan_step` with the two label vectors
and receives small integer tensors (rows / cols / seen-flags / pool-local
"fake" labels for each direction). The device train step is then a pure
function of (params, queue, batch, indices) — the speculative pass needs no
rollback because the queue update is functional (``queue.at[r, c].set(g)``
produces a fresh value; the original is untouched).

Semantics reproduced exactly (tested in tests/test_dcp.py):

* Pass A (reference forward_impl_rollback, ffc.py:208-260): gallery labels =
  ``y_labels``, probe labels = ``x_labels``; LRU + parity mutations are
  speculative and undone.
* Pass B (reference forward_impl, ffc.py:153-204): gallery labels =
  ``x_labels``, probe labels = ``y_labels``; mutations persist.
* Per-sample row = 0 for labels not yet in the pool, else the slot's parity
  counter, which then flips (ffc.py:166-177) — the 2-row queue alternates
  which copy of an identity's embedding gets refreshed.
* ``seen`` flags mark samples whose label was already pooled (including
  earlier in the same batch); the device scatters them into the [Q] blend
  mask (reference ``ones_idx``/``mask``, ffc.py:176,197-201).
* Fake labels are looked up AFTER all of the pass's insertions (ffc.py:189-194).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from vlsfr_tpu.core.lru import LRU


@jax.tree_util.register_dataclass
@dataclass
class PassIndices:
    """Index tensors for one directional pass (numpy, host-resident).

    Registered as a pytree so a StepIndices can cross the jit boundary."""

    rows: np.ndarray  # [B] int32, which of the 2 queue rows to write
    cols: np.ndarray  # [B] int32, pool slot per gallery sample
    seen: np.ndarray  # [B] float32, 1.0 if label was already pooled
    fake_labels: np.ndarray  # [B] int32, probe label -> pool slot or -1


@jax.tree_util.register_dataclass
@dataclass
class StepIndices:
    """All host-precomputed indices for one combined FFC step."""

    a: PassIndices  # speculative direction: probe(x) vs gallery(y)
    b: PassIndices  # persistent direction: probe(y) vs gallery(x)


class DCPManager:
    """Owns the LRU and per-slot parity counters; plans one step ahead.

    Thread-safety: plan_step is called from the input-pipeline thread only;
    state_dict/restore from the checkpointing path between steps. Callers
    must not interleave those concurrently (the trainer serializes them).
    """

    def __init__(self, queue_size: int):
        self.queue_size = queue_size
        self.lru = LRU(queue_size)
        # parity counter per slot (reference queue_position_dict, ffc.py:41-43)
        self.parity = np.zeros(queue_size, dtype=np.int32)

    # ------------------------------------------------------------------
    def _run_pass(self, gallery_labels, probe_labels, speculative: bool) -> PassIndices:
        n = len(gallery_labels)
        rows = np.zeros(n, dtype=np.int32)
        cols = np.zeros(n, dtype=np.int32)
        seen = np.zeros(n, dtype=np.float32)
        touched: dict[int, int] = {}  # slot -> parity before this pass
        lookup = self.lru.try_get if speculative else self.lru.get
        for i, gl in enumerate(gallery_labels):
            hit = gl in self.lru
            slot = lookup(gl)
            cols[i] = slot
            if slot not in touched:
                touched[slot] = int(self.parity[slot])
            if hit:
                rows[i] = self.parity[slot]
                seen[i] = 1.0
                self.parity[slot] ^= 1
            else:
                rows[i] = 0
                self.parity[slot] = 1
        fake = np.fromiter(
            (self.lru.view(pl) for pl in probe_labels), dtype=np.int32, count=len(probe_labels)
        )
        if speculative:
            self.lru.rollback_steps(n)
            for slot, old in touched.items():
                self.parity[slot] = old
        return PassIndices(rows=rows, cols=cols, seen=seen, fake_labels=fake)

    def plan_step(self, x_labels, y_labels) -> StepIndices:
        """Plan both directional passes of one FFC step from the current state.

        ``x_labels``/``y_labels`` are the label vectors of the two batch
        halves (reference main.py:59-60). Pass A is speculative (its pool
        mutations are undone); pass B persists, exactly like the reference's
        rollback-then-real double call (ffc.py:264-267).
        """
        x_labels = [int(v) for v in x_labels]
        y_labels = [int(v) for v in y_labels]
        a = self._run_pass(y_labels, x_labels, speculative=True)
        b = self._run_pass(x_labels, y_labels, speculative=False)
        return StepIndices(a=a, b=b)

    # ------------------------------------------------------------------
    def state_dict(self) -> dict:
        return {
            "lru": self.lru.state_dict(),
            "parity": self.parity.copy(),
            "queue_size": self.queue_size,
        }

    def restore(self, state: dict) -> None:
        assert state["queue_size"] == self.queue_size, "queue_size mismatch on restore"
        self.lru.clear()
        self.lru.restore([(int(k), int(v)) for k, v in state["lru"]])
        self.parity = np.asarray(state["parity"], dtype=np.int32).copy()
