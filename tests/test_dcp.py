"""DCPManager planner tests against an oracle implementing the reference's
forward_impl / forward_impl_rollback bookkeeping verbatim-in-spirit
(/root/reference/ffc.py:153-260) but on plain Python dicts."""

import numpy as np
import pytest

from vlsfr_tpu.core.dcp import DCPManager


class ReferenceOracle:
    """Straight-line model of the reference's per-step LRU/parity protocol."""

    def __init__(self, q):
        self.q = q
        self.order = []  # recency list, most-recent first
        self.slot = {}
        self.next_slot = 0
        self.parity = {i: 0 for i in range(q)}

    def _get(self, key):
        if key in self.slot:
            self.order.remove(key)
            self.order.insert(0, key)
            return self.slot[key]
        if self.next_slot < self.q:
            s = self.next_slot
            self.next_slot += 1
        else:
            victim = self.order.pop()
            s = self.slot.pop(victim)
        self.slot[key] = s
        self.order.insert(0, key)
        return s

    def run_pass(self, gallery_labels, probe_labels, speculative):
        saved = (list(self.order), dict(self.slot), self.next_slot, dict(self.parity))
        rows, cols, seen = [], [], []
        for gl in gallery_labels:
            hit = gl in self.slot
            s = self._get(gl)
            cols.append(s)
            if hit:
                rows.append(self.parity[s])
                seen.append(1.0)
                self.parity[s] = (self.parity[s] + 1) % 2
            else:
                rows.append(0)
                seen.append(0.0)
                self.parity[s] = 1
        fake = [self.slot.get(pl, -1) for pl in probe_labels]
        if speculative:
            self.order, self.slot, self.next_slot, self.parity = (
                saved[0],
                saved[1],
                saved[2],
                saved[3],
            )
        return rows, cols, seen, fake

    def plan(self, x_labels, y_labels):
        a = self.run_pass(y_labels, x_labels, speculative=True)
        b = self.run_pass(x_labels, y_labels, speculative=False)
        return a, b


@pytest.mark.parametrize("queue_size", [4, 16, 64])
def test_planner_matches_oracle(queue_size, rng):
    mgr = DCPManager(queue_size)
    oracle = ReferenceOracle(queue_size)
    num_ids = queue_size * 3
    for _ in range(60):
        b = 8
        # FFC batch structure: first half identical ids in x and y
        ids = rng.integers(0, num_ids, size=b // 2)
        x = np.concatenate([ids, rng.integers(0, num_ids, size=b - b // 2)])
        y = np.concatenate([ids, rng.integers(0, num_ids, size=b - b // 2)])
        got = mgr.plan_step(x, y)
        (ra, ca, sa, fa), (rb, cb, sb, fb) = oracle.plan(list(map(int, x)), list(map(int, y)))
        np.testing.assert_array_equal(got.a.rows, ra)
        np.testing.assert_array_equal(got.a.cols, ca)
        np.testing.assert_array_equal(got.a.seen, sa)
        np.testing.assert_array_equal(got.a.fake_labels, fa)
        np.testing.assert_array_equal(got.b.rows, rb)
        np.testing.assert_array_equal(got.b.cols, cb)
        np.testing.assert_array_equal(got.b.seen, sb)
        np.testing.assert_array_equal(got.b.fake_labels, fb)


def test_pass_a_is_speculative():
    mgr = DCPManager(8)
    before = mgr.state_dict()
    # labels only in y (gallery of pass A) must not persist in the pool
    x = np.array([100, 101])
    y = np.array([100, 102])
    out = mgr.plan_step(x, y)
    # pass B inserted x labels persistently
    assert mgr.lru.view(100) != -1
    assert mgr.lru.view(101) != -1
    # 102 appeared only as pass-A gallery -> rolled back
    assert mgr.lru.view(102) == -1
    assert before["lru"] == []
    # pass A fake labels: x labels looked up after y insertion: 100 present, 101 absent
    assert out.a.fake_labels[0] != -1
    assert out.a.fake_labels[1] == -1


def test_duplicate_label_in_batch_flags_seen():
    mgr = DCPManager(8)
    x = np.array([7, 7])
    y = np.array([1, 2])
    out = mgr.plan_step(x, y)
    # second occurrence of 7 in pass B gallery is a hit within the batch
    assert out.b.seen[0] == 0.0
    assert out.b.seen[1] == 1.0
    assert out.b.rows[0] == 0
    assert out.b.rows[1] == 1  # parity was set to 1 by the first occurrence


def test_state_roundtrip(rng):
    mgr = DCPManager(16)
    for _ in range(10):
        x = rng.integers(0, 50, size=6)
        y = rng.integers(0, 50, size=6)
        mgr.plan_step(x, y)
    state = mgr.state_dict()
    clone = DCPManager(16)
    clone.restore(state)
    x = rng.integers(0, 50, size=6)
    y = rng.integers(0, 50, size=6)
    a = mgr.plan_step(x, y)
    b = clone.plan_step(x, y)
    np.testing.assert_array_equal(a.b.cols, b.b.cols)
    np.testing.assert_array_equal(a.b.rows, b.b.rows)
    np.testing.assert_array_equal(a.a.fake_labels, b.a.fake_labels)
    assert mgr.state_dict()["lru"] == clone.state_dict()["lru"]
    np.testing.assert_array_equal(mgr.state_dict()["parity"], clone.state_dict()["parity"])
