"""Eval subsystem tests: verification metrics on synthetic separable
embeddings, extractor shape/padding behavior, end-to-end with ToyNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsfr_tpu.eval.extract import Embedder
from vlsfr_tpu.eval.verification import (
    best_threshold,
    cosine_scores,
    identification_topk,
    kfold_verification_accuracy,
    make_verification_pairs,
    tar_at_far,
)
from vlsfr_tpu.models import create_net


def make_separable_embeddings(rng, n_ids=10, per_id=6, d=16, noise=0.05):
    centers = rng.standard_normal((n_ids, d))
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    embs, labels = [], []
    for i in range(n_ids):
        for _ in range(per_id):
            e = centers[i] + noise * rng.standard_normal(d)
            embs.append(e / np.linalg.norm(e))
            labels.append(i)
    return np.asarray(embs, np.float32), np.asarray(labels)


def test_verification_on_separable_data(rng):
    emb, labels = make_separable_embeddings(rng)
    i1, i2, issame = make_verification_pairs(labels, 200, seed=1)
    scores = cosine_scores(emb[i1], emb[i2])
    thr, acc = best_threshold(scores, issame)
    assert acc > 0.95
    mean, std = kfold_verification_accuracy(scores, issame)
    assert mean > 0.9
    assert tar_at_far(scores, issame, far=0.01) > 0.8


def test_identification_topk(rng):
    emb, labels = make_separable_embeddings(rng)
    # gallery = first of each id, probes = rest
    g = [np.where(labels == i)[0][0] for i in range(10)]
    p = [j for j in range(len(labels)) if j not in g]
    r1 = identification_topk(emb[g], labels[g], emb[p], labels[p], k=1)
    assert r1 > 0.9
    r5 = identification_topk(emb[g], labels[g], emb[p], labels[p], k=5)
    assert r5 >= r1


def test_pairs_are_balanced_and_valid(rng):
    labels = np.repeat(np.arange(5), 4)
    i1, i2, issame = make_verification_pairs(labels, 100, seed=0)
    assert len(i1) == 100
    assert issame.sum() == 50
    same_mask = issame.astype(bool)
    assert np.all(labels[i1[same_mask]] == labels[i2[same_mask]])
    assert np.all(labels[i1[~same_mask]] != labels[i2[~same_mask]])


def test_embedder_padding_and_flip(rng):
    model = create_net("toy", feat_dim=16)
    x = rng.standard_normal((5, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    emb = Embedder(model, variables, batch_size=4, flip_average=True)
    out = emb(x)  # 5 images with batch 4 → padded tail batch
    assert out.shape == (5, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    # deterministic
    np.testing.assert_allclose(out, emb(x), atol=1e-6)
    # flip-average differs from plain
    emb2 = Embedder(model, variables, batch_size=4, flip_average=False)
    assert not np.allclose(out, emb2(x))


def test_face_index_search(rng):
    from vlsfr_tpu.eval.index import FaceIndex

    emb, labels = make_separable_embeddings(rng, n_ids=8, per_id=4, d=16)
    idx = FaceIndex(feat_dim=16)
    idx.add(emb[::2], labels[::2])
    idx.add(emb[1::2], labels[1::2])
    assert len(idx) == len(emb)
    vals, rows, got = idx.search(emb[:6], k=3)
    assert vals.shape == (6, 3)
    # top-1 should be (nearly) the query itself -> same label
    np.testing.assert_array_equal(got[:, 0], labels[:6])
    assert np.all(vals[:, 0] >= vals[:, 1])
    # identify with a high threshold rejects nothing here
    top = idx.identify(emb[:6], threshold=0.5)
    np.testing.assert_array_equal(top, labels[:6])


def test_face_index_streaming_matches_dense(rng):
    """tile smaller than the gallery forces the multi-step scan; results
    must match a single-tile search bit-for-bit (same compute dtype)."""
    from vlsfr_tpu.eval.index import FaceIndex

    emb, labels = make_separable_embeddings(rng, n_ids=20, per_id=25, d=16)
    one = FaceIndex(feat_dim=16, tile=1 << 20)  # clamps to 512: 1 scan step
    tiled = FaceIndex(feat_dim=16, tile=128)    # 500 rows -> 4 scan steps
    for idx in (one, tiled):
        idx.add(emb, labels)
    q = emb[: 7]
    v1, r1, l1 = one.search(q, k=4)
    v2, r2, l2 = tiled.search(q, k=4)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(l1, l2)


def test_face_index_k_exceeds_gallery(rng):
    from vlsfr_tpu.eval.index import FaceIndex

    emb, labels = make_separable_embeddings(rng, n_ids=3, per_id=1, d=16)
    idx = FaceIndex(feat_dim=16)
    idx.add(emb, labels)
    vals, rows, got = idx.search(emb, k=5)
    assert vals.shape == (3, 5)
    # slots beyond the 3 real rows are -inf / -1
    assert np.all(rows[:, 3:] == -1) and np.all(got[:, 3:] == -1)
    assert np.all(np.isneginf(vals[:, 3:]))
    np.testing.assert_array_equal(got[:, 0], labels)


def test_face_index_int8(rng):
    """Int8 gallery storage: ranking on separated identities is unchanged
    and scores drift < 2e-2 (per-row symmetric quantization)."""
    from vlsfr_tpu.eval.index import FaceIndex

    emb, labels = make_separable_embeddings(rng, n_ids=12, per_id=4, d=64)
    fp = FaceIndex(feat_dim=64)
    q8 = FaceIndex(feat_dim=64, int8=True, tile=128)
    for idx in (fp, q8):
        idx.add(emb, labels)
    v_f, _, l_f = fp.search(emb[:10], k=3)
    v_q, _, l_q = q8.search(emb[:10], k=3)
    np.testing.assert_array_equal(l_f[:, 0], l_q[:, 0])
    np.testing.assert_allclose(v_f, v_q, atol=2e-2)
    # storage really is ~1 byte/elem (+4-byte row scale) vs 2 (bf16)
    assert q8.nbytes() < fp.nbytes()


def test_face_index_int8_compute(rng):
    """compute_dtype=int8: queries quantized too, int8×int8→int32 scoring
    (2× MXU rate on v5e). Ranking on separated identities unchanged,
    scores within the per-row-quantization drift bound."""
    import pytest as _pytest

    from vlsfr_tpu.eval.index import FaceIndex

    emb, labels = make_separable_embeddings(rng, n_ids=12, per_id=4, d=64)
    fp = FaceIndex(feat_dim=64)
    q8 = FaceIndex(feat_dim=64, int8=True, compute_dtype=jnp.int8, tile=128)
    for idx in (fp, q8):
        idx.add(emb, labels)
    v_f, _, l_f = fp.search(emb[:10], k=3)
    v_q, _, l_q = q8.search(emb[:10], k=3)
    np.testing.assert_array_equal(l_f[:, 0], l_q[:, 0])
    np.testing.assert_allclose(v_f, v_q, atol=3e-2)

    # sharded variant matches the unsharded int8-compute path exactly
    from vlsfr_tpu.parallel.mesh import make_mesh

    sh = FaceIndex(feat_dim=64, mesh=make_mesh(1, 8), int8=True,
                   compute_dtype=jnp.int8, tile=128)
    sh.add(emb, labels)
    v_s, _, l_s = sh.search(emb[:10], k=3)
    np.testing.assert_array_equal(l_q, l_s)
    np.testing.assert_allclose(v_q, v_s, atol=1e-6)

    # int8 compute without int8 storage is a config error
    with _pytest.raises(ValueError):
        FaceIndex(feat_dim=64, compute_dtype=jnp.int8)


def test_face_index_sharded_int8(rng):
    from vlsfr_tpu.eval.index import FaceIndex
    from vlsfr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 8)
    emb, labels = make_separable_embeddings(rng, n_ids=16, per_id=4, d=32)
    ref = FaceIndex(feat_dim=32, int8=True)
    sh = FaceIndex(feat_dim=32, mesh=mesh, int8=True, tile=128)
    for idx in (ref, sh):
        idx.add(emb, labels)
    v_r, _, l_r = ref.search(emb[:9], k=3)
    v_s, _, l_s = sh.search(emb[:9], k=3)
    np.testing.assert_array_equal(l_r, l_s)
    np.testing.assert_allclose(v_r, v_s, atol=1e-6)


def test_face_index_sharded(rng):
    from vlsfr_tpu.eval.index import FaceIndex
    from vlsfr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 8)
    emb, labels = make_separable_embeddings(rng, n_ids=10, per_id=3, d=16)
    idx = FaceIndex(feat_dim=16, mesh=mesh)
    idx.add(emb, labels)  # 30 rows -> padded to 32 across 8 shards
    vals, rows, got = idx.search(emb[:5], k=2)
    np.testing.assert_array_equal(got[:, 0], labels[:5])


def test_profiling_utils(tmp_path):
    import jax
    import jax.numpy as jnp

    from vlsfr_tpu.utils.profiling import StepTimer, trace_steps

    timer = StepTimer()
    for _ in range(3):
        with timer:
            jax.block_until_ready(jnp.ones(8) * 2)
    s = timer.summary()
    assert s["steps"] == 3 and s["mean_ms"] >= 0
    with trace_steps(str(tmp_path / "tr"), enabled=True):
        jax.block_until_ready(jnp.ones(8) + 1)
    import glob

    assert glob.glob(str(tmp_path / "tr" / "**" / "*.xplane.pb"), recursive=True)
    # disabled path is a no-op
    with trace_steps(str(tmp_path / "tr2"), enabled=False):
        pass


def test_insightface_bin_roundtrip(tmp_path, rng):
    """Synthetic .bin in the insightface layout evaluates end-to-end."""
    import pickle

    import cv2

    from vlsfr_tpu.eval.verification import evaluate_bin, load_insightface_bin
    from vlsfr_tpu.models import create_net

    # 6 pairs: 3 same (identical images), 3 different
    bins, issame = [], []
    def jpg(seed):
        r = np.random.default_rng(seed)
        img = r.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        return buf.tobytes()
    for i in range(3):
        b = jpg(i)
        bins += [b, b]
        issame.append(1)
    for i in range(3):
        bins += [jpg(100 + i), jpg(200 + i)]
        issame.append(0)
    p = tmp_path / "fake_lfw.bin"
    with open(p, "wb") as f:
        pickle.dump((bins, issame), f)

    imgs, same = load_insightface_bin(str(p), 32)
    assert imgs.shape == (12, 32, 32, 3)
    np.testing.assert_array_equal(same, [1, 1, 1, 0, 0, 0])

    model = create_net("toy", feat_dim=16)
    import jax

    variables = model.init(jax.random.PRNGKey(0), imgs[:1], train=False)
    emb = Embedder(model, variables, batch_size=4)
    res = evaluate_bin(emb, str(p), 32)
    assert res["num_pairs"] == 6
    # identical-image pairs score cosine 1.0 -> perfect separability here
    assert res["verification_acc"] >= 0.8


import pytest as _pytest


@_pytest.fixture(scope="module")
def store(tmp_path_factory):
    from vlsfr_tpu.data.synthetic import generate_synthetic_store

    d = tmp_path_factory.mktemp("eval_store")
    generate_synthetic_store(str(d), num_ids=6, images_per_id=4, image_size=64, seed=0)
    return str(d)


def test_bin_write_load_roundtrip(tmp_path, store):
    """save_insightface_bin -> load_insightface_bin round-trip, plus the
    store->bin export path used to generate standard verification sets."""
    import numpy as np

    from vlsfr_tpu.data.pipeline import decode_image, normalize
    from vlsfr_tpu.data.records import MultiSourceReader
    from vlsfr_tpu.eval.verification import (
        load_insightface_bin,
        make_bin_from_store,
        save_insightface_bin,
    )

    r = MultiSourceReader([store])
    payloads = [r.payload(i) for i in range(6)]
    issame = np.asarray([1, 0, 1], np.int32)
    path = str(tmp_path / "tiny.bin")
    save_insightface_bin(path, payloads, issame)
    imgs, same = load_insightface_bin(path, 64)
    assert imgs.shape == (6, 64, 64, 3)
    np.testing.assert_array_equal(same, issame)
    want0 = normalize(decode_image(r.payload(0), 64), False)
    np.testing.assert_allclose(imgs[0], want0)
    r.close()

    out = str(tmp_path / "export.bin")
    n = make_bin_from_store([store], out, num_pairs=20, seed=0)
    imgs2, same2 = load_insightface_bin(out, 64)
    assert imgs2.shape[0] == 2 * n and len(same2) == n
    assert same2.sum() == n // 2  # balanced


def test_holdout_split_excludes_eval_records(store):
    """record_limit keeps held-out records out of BOTH training streams."""
    import numpy as np

    from vlsfr_tpu.data.pipeline import InstanceStream, PairStream
    from vlsfr_tpu.data.records import MultiSourceReader

    r = MultiSourceReader([store])
    n = len(r)
    limit = n - 8
    ins = InstanceStream(r, batch_size=4, seed=0, record_limit=limit)
    for step in range(ins.steps_per_epoch()):
        assert (ins.batch_indices(0, step) < limit).all()
    pairs = PairStream(r, batch_size=2, seed=0, record_limit=limit)
    for step in range(4):
        _, rec1, rec2 = pairs.batch(0, step)
        assert (rec1 < limit).all() and (rec2 < limit).all()
    r.close()


def test_face_index_from_arrays_int8_matches_built(rng):
    """from_arrays around a prebuilt int8 gallery searches identically to
    an add()-built int8 index over the same rows (same quantization)."""
    from vlsfr_tpu.eval.index import FaceIndex, _quantize_rows

    emb, labels = make_separable_embeddings(rng, n_ids=12, per_id=4, d=64)
    built = FaceIndex(feat_dim=64, int8=True, tile=128)
    built.add(emb, labels)
    # prebuild with the same row quantizer, padded shape handled inside
    q, s = _quantize_rows(emb)
    pre = FaceIndex.from_arrays(q, labels, s, tile=128)
    q_probe = emb[:9]
    v1, r1, l1 = built.search(q_probe, k=3)
    v2, r2, l2 = pre.search(q_probe, k=3)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(l1, l2)
    # the public accessors expose the built arrays (bench harness uses them)
    assert pre.gallery.dtype == jnp.int8
    assert pre.row_scales.shape[0] == pre.gallery.shape[0]
    vals, idx = pre.search_fn()(pre.gallery, pre.row_scales,
                                jnp.asarray(q_probe), 3)
    np.testing.assert_allclose(np.asarray(vals), v1, rtol=0, atol=1e-6)


def test_face_index_from_arrays_float_and_padding(rng):
    """Float from_arrays path with a non-tile-multiple row count: padding
    rows never appear in results."""
    from vlsfr_tpu.eval.index import FaceIndex

    emb, labels = make_separable_embeddings(rng, n_ids=10, per_id=3, d=16)
    assert emb.shape[0] % 128 != 0  # 30 rows -> tile clamps + pads
    ref = FaceIndex(feat_dim=16, tile=128)
    ref.add(emb, labels)
    pre = FaceIndex.from_arrays(emb, labels, tile=128)
    v1, r1, l1 = ref.search(emb[:8], k=4)
    v2, r2, l2 = pre.search(emb[:8], k=4)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(l1, l2)
    assert np.all(r2 < len(emb))


def test_face_index_from_arrays_sharded(rng):
    """from_arrays with a mesh shards the prebuilt rows and matches the
    unsharded search."""
    from vlsfr_tpu.eval.index import FaceIndex, _quantize_rows
    from vlsfr_tpu.parallel.mesh import make_mesh

    emb, labels = make_separable_embeddings(rng, n_ids=16, per_id=8, d=32)
    q, s = _quantize_rows(emb)
    flat = FaceIndex.from_arrays(q, labels, s, tile=128)
    sh = FaceIndex.from_arrays(q, labels, s, tile=128, mesh=make_mesh(1, 8))
    v1, _, l1 = flat.search(emb[:7], k=3)
    v2, _, l2 = sh.search(emb[:7], k=3)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(l1, l2)
