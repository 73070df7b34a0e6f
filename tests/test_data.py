"""Data layer tests: record store, multi-source label re-basing, samplers,
FFC batch composition, determinism (reference util/lmdb_loader.py semantics)."""

import numpy as np
import pytest

from vlsfr_tpu.data.pipeline import FFCPipeline, InstanceStream, PairStream, decode_image, normalize
from vlsfr_tpu.data.records import FaceRecordReader, FaceRecordWriter, MultiSourceReader
from vlsfr_tpu.data.synthetic import generate_synthetic_store

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("store")
    generate_synthetic_store(str(d), num_ids=6, images_per_id=4, image_size=64, seed=0)
    return str(d)


def test_writer_reader_roundtrip(tmp_path):
    d = str(tmp_path / "s")
    with FaceRecordWriter(d) as w:
        w.add("k0", 0, b"abc")
        w.add("k1", 0, b"defgh")
        w.add("k2", 1, b"z")
    r = FaceRecordReader(d)
    assert len(r) == 3
    assert r.payload(0) == b"abc"
    assert r.payload(1) == b"defgh"
    assert r.payload(2) == b"z"
    assert list(r.labels) == [0, 0, 1]
    r.close()
    # reference-compatible manifest exists
    manifest = (tmp_path / "s" / "train_kv.txt").read_text().splitlines()
    assert manifest == ["k0 0", "k1 0", "k2 1"]


def test_multi_source_label_rebasing(tmp_path):
    """Cross-db re-basing rule of util/lmdb_loader.py:32-43."""
    for name, labels in [("a", [0, 1, 1, 2]), ("b", [0, 0, 1])]:
        with FaceRecordWriter(str(tmp_path / name)) as w:
            for i, l in enumerate(labels):
                w.add(f"{name}{i}", l, b"x")
    m = MultiSourceReader([str(tmp_path / "a"), str(tmp_path / "b")])
    # db a: labels 0..2 -> max 2 -> next base 3; db b: 3,3,4 -> num_class 5
    assert list(m.labels) == [0, 1, 1, 2, 3, 3, 4]
    assert m.num_class == 5
    assert m.label(4) == 3
    assert m.payload(4) == b"x"
    m.close()


def test_synthetic_store_decodes(store):
    r = MultiSourceReader([store])
    assert len(r) == 24
    img = decode_image(r.payload(0), 64)
    assert img.shape == (64, 64, 3)
    assert img.dtype == np.uint8
    r.close()


def test_normalize_contract():
    img = np.full((4, 4, 3), 127.5 + 128.0, dtype=np.float64).astype(np.uint8)
    out = normalize(np.full((4, 4, 3), 255, dtype=np.uint8), flip=False)
    np.testing.assert_allclose(out, (255 - 127.5) * 0.0078125)
    # flip reverses width axis
    asym = np.zeros((1, 2, 3), dtype=np.uint8)
    asym[0, 0] = 255
    flipped = normalize(asym, flip=True)
    assert flipped[0, 1, 0] > flipped[0, 0, 0]


def test_instance_stream_determinism(store):
    r = MultiSourceReader([store])
    s = InstanceStream(r, batch_size=4, seed=7)
    a = s.batch_indices(epoch=2, step=1)
    b = s.batch_indices(epoch=2, step=1)
    np.testing.assert_array_equal(a, b)
    # different epoch -> different order
    c = s.batch_indices(epoch=3, step=1)
    assert not np.array_equal(a, c)
    # permutation covers dataset exactly once per epoch
    perm = s.epoch_indices(0)
    assert sorted(perm) == list(range(len(r)))
    r.close()


def test_pair_stream_pairs_same_identity(store):
    r = MultiSourceReader([store])
    s = PairStream(r, batch_size=3, seed=1)
    labels, r1, r2 = s.batch(epoch=0, step=0)
    assert len(labels) == 3
    for l, a, b in zip(labels, r1, r2):
        assert r.label(int(a)) == l
        assert r.label(int(b)) == l
    r.close()


def test_pair_stream_single_image_identity(tmp_path):
    d = str(tmp_path / "one")
    generate_synthetic_store(d, num_ids=2, images_per_id=1, image_size=32, seed=0)
    r = MultiSourceReader([d])
    s = PairStream(r, batch_size=2, seed=0)
    labels, r1, r2 = s.batch(0, 0)
    np.testing.assert_array_equal(r1, r2)  # duplicated (lmdb_loader.py:196-199)
    r.close()


def test_ffc_batch_composition(store):
    r = MultiSourceReader([store])
    p = FFCPipeline(r, batch_size=8, image_size=64, seed=0, num_workers=2)
    batch = p.make_batch(epoch=0, step=0)
    assert batch.x.shape == (8, 64, 64, 3)
    assert batch.y.shape == (8, 64, 64, 3)
    assert batch.x.dtype == np.float32
    # first half labels identical between x and y (the id pairs)
    np.testing.assert_array_equal(batch.x_label[:4], batch.y_label[:4])
    # values in normalized range
    assert batch.x.min() >= -1.0 and batch.x.max() <= 1.0
    # deterministic rebuild
    again = p.make_batch(epoch=0, step=0)
    np.testing.assert_array_equal(batch.x, again.x)
    np.testing.assert_array_equal(batch.y_label, again.y_label)
    p.close()
    r.close()


def test_epoch_iter_prefetch(store):
    r = MultiSourceReader([store])
    p = FFCPipeline(r, batch_size=8, image_size=64, seed=0, num_workers=2, prefetch=2)
    steps = list(p.epoch_iter(epoch=0))
    assert len(steps) == p.steps_per_epoch() == len(r) // 8
    assert steps[0].step == 0 and steps[-1].step == p.steps_per_epoch() - 1
    # start_step resume
    resumed = list(p.epoch_iter(epoch=0, start_step=1))
    np.testing.assert_array_equal(resumed[0].x, steps[1].x)
    p.close()
    r.close()


def test_reduced_decode(tmp_path):
    """Stored 224², trained 112² → decode at 1/2 resolution (≈4× cheaper),
    visually equivalent to full decode + resize."""
    from vlsfr_tpu.data.pipeline import probe_decode_reduce

    d = str(tmp_path / "big")
    generate_synthetic_store(d, num_ids=2, images_per_id=2, image_size=224, seed=0)
    r = MultiSourceReader([d])
    assert probe_decode_reduce(r, 112) == 2
    assert probe_decode_reduce(r, 224) == 1
    assert probe_decode_reduce(r, 56) == 4
    full = decode_image(r.payload(0), 112, reduce=1).astype(np.float32)
    fast = decode_image(r.payload(0), 112, reduce=2).astype(np.float32)
    assert fast.shape == (112, 112, 3)
    # same content modulo resampling differences
    assert np.mean(np.abs(full - fast)) < 8.0
    p = FFCPipeline(r, batch_size=2, image_size=112, num_workers=1)
    assert p.reduce == 2
    b = p.make_batch(0, 0)
    assert b.x.shape == (2, 112, 112, 3)
    p.close()
    r.close()


def test_grayscale_decode_contract(tmp_path):
    """Grayscale JPEGs replicate to 3 channels (util/lmdb_loader.py:115-119)."""
    gray = np.linspace(0, 255, 32 * 32, dtype=np.uint8).reshape(32, 32)
    ok, buf = cv2.imencode(".jpg", gray)
    assert ok
    img = decode_image(buf.tobytes(), 32)
    assert img.shape == (32, 32, 3)
    np.testing.assert_array_equal(img[..., 0], img[..., 1])
    np.testing.assert_array_equal(img[..., 1], img[..., 2])


def test_ffc_pipeline_host_slice_decodes_only_local_rows(store):
    """Multi-host decode slicing: a host with slice [2:6) must produce
    exactly rows 2..5 of the full pipeline's images, with GLOBAL labels."""
    r = MultiSourceReader([store])
    full = FFCPipeline(r, batch_size=8, image_size=64, seed=0, num_workers=2)
    part = FFCPipeline(r, batch_size=8, image_size=64, seed=0, num_workers=2,
                       host_slice=slice(2, 6))
    bf = full.make_batch(0, 0)
    bp = part.make_batch(0, 0)
    assert bp.x.shape[0] == 4 and bp.y.shape[0] == 4
    np.testing.assert_array_equal(bp.x, bf.x[2:6])
    np.testing.assert_array_equal(bp.y, bf.y[2:6])
    # labels stay global (the DCP planner needs the full plan on every host)
    np.testing.assert_array_equal(bp.x_label, bf.x_label)
    np.testing.assert_array_equal(bp.y_label, bf.y_label)
    full.close(); part.close()
    r.close()


def test_instance_pipeline_host_slice(store):
    from vlsfr_tpu.data.pipeline import InstancePipeline

    r = MultiSourceReader([store])
    full = InstancePipeline(r, batch_size=8, image_size=64, seed=0, num_workers=2)
    part = InstancePipeline(r, batch_size=8, image_size=64, seed=0, num_workers=2,
                            host_slice=slice(4, 8))
    bf = full.make_batch(0, 0)
    bp = part.make_batch(0, 0)
    assert bp.images.shape[0] == 4
    np.testing.assert_array_equal(bp.images, bf.images[4:8])
    np.testing.assert_array_equal(bp.labels, bf.labels)  # global
    full.close(); part.close()
    r.close()
