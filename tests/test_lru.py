"""LRU / rollback state-machine tests (reference semantics: lru.py:21-255).

Strategy per SURVEY.md §4: property tests against a brute-force oracle, and
rollback-inverse checks (try_get* ; rollback_steps == identity).
"""

import numpy as np
import pytest

from vlsfr_tpu.core.lru import LRU


class OracleLRU:
    """Brute-force recency-list model of the reference LRU semantics."""

    def __init__(self, capacity):
        self.capacity = capacity
        self.order = []  # keys, most-recent first
        self.slot = {}  # key -> slot
        self.next_slot = 0

    def get(self, key):
        if key in self.slot:
            self.order.remove(key)
            self.order.insert(0, key)
            return self.slot[key]
        if self.next_slot < self.capacity:
            s = self.next_slot
            self.next_slot += 1
        else:
            victim = self.order.pop()  # least recent
            s = self.slot.pop(victim)
        self.slot[key] = s
        self.order.insert(0, key)
        return s

    def view(self, key):
        return self.slot.get(key, -1)

    def state(self):
        return [(k, self.slot[k]) for k in self.order]


def snapshot(lru: LRU):
    return lru.state_dict()


def test_basic_insert_and_slots():
    lru = LRU(3)
    assert lru.get("a") == 0
    assert lru.get("b") == 1
    assert lru.get("c") == 2
    assert lru.get("a") == 0  # hit promotes, slot stable
    assert "a" in lru and "z" not in lru
    assert lru.view("b") == 1
    assert lru.view("zz") == -1
    assert len(lru) == 3


def test_eviction_reuses_slot_of_lru_victim():
    lru = LRU(2)
    lru.get("a")  # slot 0
    lru.get("b")  # slot 1
    lru.get("a")  # promote a; b is now LRU
    assert lru.get("c") == 1  # evicts b, reuses slot 1
    assert "b" not in lru
    assert lru.view("a") == 0


def test_recency_order_in_state_dict():
    lru = LRU(4)
    for k in ["a", "b", "c"]:
        lru.get(k)
    lru.get("a")
    assert [k for k, _ in lru.state_dict()] == ["a", "c", "b"]
    assert list(lru) == lru.state_dict()


@pytest.mark.parametrize("capacity", [1, 2, 5, 17])
def test_matches_oracle_random_workload(capacity, rng):
    lru = LRU(capacity)
    oracle = OracleLRU(capacity)
    keys = list(range(capacity * 3))
    for _ in range(500):
        k = int(rng.choice(keys))
        assert lru.get(k) == oracle.get(k)
        assert lru.state_dict() == oracle.state()
    for k in keys:
        assert lru.view(k) == oracle.view(k)


@pytest.mark.parametrize("capacity", [1, 3, 8])
def test_try_get_rollback_is_identity(capacity, rng):
    lru = LRU(capacity)
    # random warmup with persistent gets
    for _ in range(50):
        lru.get(int(rng.integers(0, capacity * 2)))
    before = snapshot(lru)
    # speculative batch of random size, then rollback
    n = int(rng.integers(1, 20))
    results = [lru.try_get(int(rng.integers(0, capacity * 4))) for _ in range(n)]
    assert len(results) == n
    lru.rollback_steps(n)
    assert snapshot(lru) == before
    assert lru.pending_ops == 0


def test_try_get_equals_get_result_sequence(rng):
    """try_get must return the same slots a persistent get sequence would."""
    cap = 5
    seq = [int(rng.integers(0, 12)) for _ in range(40)]
    a, b = LRU(cap), LRU(cap)
    res_a = [a.try_get(k) for k in seq]
    res_b = [b.get(k) for k in seq]
    assert res_a == res_b
    assert a.state_dict() == b.state_dict()
    a.rollback_steps(len(seq))
    assert a.state_dict() == []


def test_partial_rollback(rng):
    lru = LRU(3)
    for k in [1, 2, 3]:
        lru.get(k)
    mid = snapshot(lru)
    lru.try_get(4)  # evicts 1
    after_one = snapshot(lru)
    lru.try_get(2)  # promote
    lru.rollback_steps(1)  # undo the promote only
    assert snapshot(lru) == after_one
    lru.rollback_steps(1)
    assert snapshot(lru) == mid


def test_restore_roundtrip(rng):
    lru = LRU(6)
    for _ in range(30):
        lru.get(int(rng.integers(0, 10)))
    state = lru.state_dict()
    fresh = LRU(6)
    fresh.restore(state)
    assert fresh.state_dict() == state
    # behaves identically afterwards
    for k in [99, 0, 5]:
        assert fresh.get(k) == LRUReplay(state, 6).get(k)


class LRUReplay:
    """Helper: independent LRU initialized from a state_dict."""

    def __init__(self, state, cap):
        self.inner = LRU(cap)
        self.inner.restore(state)

    def get(self, k):
        return self.inner.get(k)


def test_clear():
    lru = LRU(3)
    for k in [1, 2, 3]:
        lru.get(k)
    lru.clear()
    assert len(lru) == 0
    assert lru.state_dict() == []
    assert lru.get(7) == 0  # slots reallocate from 0
