"""Native (C++) host-runtime tests: DCP planner and record reader must be
bit-equivalent to their Python references."""

import numpy as np
import pytest

from vlsfr_tpu.core.dcp import DCPManager
from vlsfr_tpu.core.dcp_native import create_dcp_manager, native_available
from vlsfr_tpu.data.records import FaceRecordReader, FaceRecordWriter, MultiSourceReader

needs_native = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


@needs_native
@pytest.mark.parametrize("queue_size", [4, 64, 1000])
def test_native_planner_matches_python(queue_size, rng):
    py = DCPManager(queue_size)
    cc = create_dcp_manager(queue_size, native=True)
    assert type(cc).__name__ == "NativeDCPManager"
    for step in range(100):
        b = int(rng.integers(2, 24))
        ids = rng.integers(0, queue_size * 4, size=b // 2 + 1)
        x = np.concatenate([ids, rng.integers(0, queue_size * 4, size=b)])
        y = np.concatenate([ids, rng.integers(0, queue_size * 4, size=b)])
        a, c = py.plan_step(x, y), cc.plan_step(x, y)
        for pa, pc in [(a.a, c.a), (a.b, c.b)]:
            np.testing.assert_array_equal(pa.rows, pc.rows)
            np.testing.assert_array_equal(pa.cols, pc.cols)
            np.testing.assert_array_equal(pa.seen, pc.seen)
            np.testing.assert_array_equal(pa.fake_labels, pc.fake_labels)
    sa, sc = py.state_dict(), cc.state_dict()
    assert sa["lru"] == sc["lru"]
    np.testing.assert_array_equal(sa["parity"], sc["parity"])


@needs_native
def test_native_planner_state_roundtrip(rng):
    cc = create_dcp_manager(32, native=True)
    for _ in range(20):
        cc.plan_step(rng.integers(0, 100, 8), rng.integers(0, 100, 8))
    state = cc.state_dict()
    # restore into python AND native; both continue identically
    py = DCPManager(32)
    py.restore(state)
    cc2 = create_dcp_manager(32, native=True)
    cc2.restore(state)
    x, y = rng.integers(0, 100, 8), rng.integers(0, 100, 8)
    a, b = py.plan_step(x, y), cc2.plan_step(x, y)
    np.testing.assert_array_equal(a.b.cols, b.b.cols)
    np.testing.assert_array_equal(a.a.fake_labels, b.a.fake_labels)


@needs_native
def test_native_record_reader(tmp_path):
    from vlsfr_tpu.data.records_native import NativeRecordReader

    d = str(tmp_path / "s")
    payloads = [b"hello", b"", b"worldworld", bytes(range(256))]
    with FaceRecordWriter(d) as w:
        for i, p in enumerate(payloads):
            w.add(f"k{i}", i % 2, p)
    nr = NativeRecordReader(d)
    pr = FaceRecordReader(d)
    assert len(nr) == len(pr) == 4
    np.testing.assert_array_equal(nr.labels, pr.labels)
    for i, p in enumerate(payloads):
        assert nr.payload(i) == pr.payload(i) == p
    buf, offs = nr.gather([3, 0, 2])
    assert bytes(buf[offs[0]:offs[1]]) == payloads[3]
    assert bytes(buf[offs[1]:offs[2]]) == payloads[0]
    assert bytes(buf[offs[2]:offs[3]]) == payloads[2]
    nr.close()
    pr.close()


@needs_native
def test_multisource_uses_native(tmp_path):
    d = str(tmp_path / "s")
    with FaceRecordWriter(d) as w:
        w.add("a", 0, b"x")
    m = MultiSourceReader([d])
    assert type(m.sources[0].reader).__name__ == "NativeRecordReader"
    assert m.payload(0) == b"x"
    m.close()
    m2 = MultiSourceReader([d], native=False)
    assert type(m2.sources[0].reader).__name__ == "FaceRecordReader"
    m2.close()
