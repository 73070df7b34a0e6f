"""Fused streaming margin-softmax tests.

Ladder of equivalence (SURVEY.md §4 style):
  add_margin (dense reference impl, itself golden-tested vs numpy)
    == streaming scan implementation (values AND gradients)
    == Pallas kernel in interpreter mode (values; CPU-runnable)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsfr_tpu.ops.margin import add_margin
from vlsfr_tpu.ops.margin_pallas import (
    _stream_fwd,
    compute_gt,
    fused_add_margin,
    fused_margin_softmax,
    pallas_margin_ce_fwd,
)


def make_case(rng, b=12, c=100, d=16, frac_outlier=0.4):
    emb = rng.standard_normal((b, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    w = rng.standard_normal((c, d)).astype(np.float32)
    labels = rng.integers(0, c, size=b).astype(np.int32)
    labels[rng.random(b) < frac_outlier] = -1
    return jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels)


def dense_loss(emb, w, labels, loss_type, k):
    wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    cos = emb @ wn.T
    return add_margin(cos, labels, loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=k)


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
@pytest.mark.parametrize("tile", [32, 64, 128])
def test_streaming_matches_dense(loss_type, tile, rng):
    emb, w, labels = make_case(rng)
    want = float(dense_loss(emb, w, labels, loss_type, 5))
    got = float(
        fused_add_margin(
            emb, w, labels, loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=5,
            tile=tile, use_pallas=False,
        )
    )
    assert got == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_streaming_grads_match_dense(loss_type, rng):
    emb, w, labels = make_case(rng, b=8, c=64, d=8)

    def dense(e, ww):
        return dense_loss(e, ww, labels, loss_type, 3)

    def fused(e, ww):
        return fused_add_margin(
            e, ww, labels, loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=3,
            tile=16, use_pallas=False,
        )

    gd_e, gd_w = jax.grad(dense, argnums=(0, 1))(emb, w)
    gf_e, gf_w = jax.grad(fused, argnums=(0, 1))(emb, w)
    np.testing.assert_allclose(np.asarray(gf_e), np.asarray(gd_e), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gd_w), atol=2e-5)


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_pallas_interpret_matches_streaming(loss_type, rng):
    emb, w, labels = make_case(rng, b=8, c=70, d=128)
    gt = compute_gt(emb, w, labels, True)
    kw = dict(loss_type=loss_type, margin=0.5, scale=24.0, k=4, mask_svfc=1.2,
              normalize_w=True, tile=32)
    ce_s, neg_s, logz_s, topk_s = _stream_fwd(emb, w, labels, gt, **kw)
    ce_p, neg_p, logz_p, topk_p = pallas_margin_ce_fwd(
        emb, w, labels, gt, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(ce_p), np.asarray(ce_s), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(neg_p), np.asarray(neg_s), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logz_p), np.asarray(logz_s), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(topk_p), np.asarray(topk_s), rtol=2e-5, atol=1e-5)


def test_prenormalized_weights_path(rng):
    emb, w, labels = make_case(rng, b=6, c=40, d=8, frac_outlier=0.0)
    wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    a = float(fused_add_margin(emb, wn, labels, normalize_w=False, hard_neg=3,
                               tile=16, use_pallas=False))
    b_ = float(fused_add_margin(emb, w, labels, normalize_w=True, hard_neg=3,
                                tile=16, use_pallas=False))
    assert a == pytest.approx(b_, rel=1e-5)


def test_all_outliers_neg_only(rng):
    emb, w, labels = make_case(rng, b=6, c=50, d=8, frac_outlier=1.1)
    assert np.all(np.asarray(labels) == -1)
    ce, neg, _topk = fused_margin_softmax(emb, w, labels, "Arc", 0.5, 24.0, 3, 1.2, True, 16, False)
    np.testing.assert_array_equal(np.asarray(ce), 0.0)
    assert np.all(np.asarray(neg) >= 0.0)


def test_large_class_count_memory_safe(rng):
    """200k classes: dense logits would be 12 MB here, but at 10M classes the
    dense path would OOM — the streaming path's memory is O(B·tile)."""
    emb, w, labels = make_case(rng, b=4, c=200_000, d=32, frac_outlier=0.2)
    loss = float(fused_add_margin(emb, w, labels, hard_neg=10, tile=4096, use_pallas=False))
    assert np.isfinite(loss)


def test_ffc_directional_loss_fused_matches_dense(rng):
    """core.ffc.directional_loss with use_fused must equal the dense path."""
    import jax.numpy as jnp

    from vlsfr_tpu.core.ffc import directional_loss, init_queue

    b, d, q = 6, 16, 64
    p = rng.standard_normal((b, d)).astype(np.float32)
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    g = rng.standard_normal((b, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    queue = init_queue(jax.random.PRNGKey(0), q, d)[0]
    rows = rng.integers(0, 2, size=b).astype(np.int32)
    cols = rng.integers(0, q, size=b).astype(np.int32)
    seen = (rng.random(b) < 0.5).astype(np.float32)
    fake = rng.integers(-1, q, size=b).astype(np.int32)
    kw = dict(loss_type="Arc", margin=0.5, scale=24.0, hard_neg=3)
    l_dense, q_dense = directional_loss(
        jnp.asarray(p), jnp.asarray(g), queue, rows, cols, seen, fake, use_fused=False, **kw
    )
    l_fused, q_fused = directional_loss(
        jnp.asarray(p), jnp.asarray(g), queue, rows, cols, seen, fake, use_fused=True, **kw
    )
    assert float(l_fused) == pytest.approx(float(l_dense), rel=1e-4)
    np.testing.assert_allclose(np.asarray(q_fused), np.asarray(q_dense))


def test_streaming_softmax_loss_matches_dense(rng):
    from vlsfr_tpu.parallel.partial_fc import margin_softmax_loss

    b, d, c = 8, 16, 96
    emb = rng.standard_normal((b, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    w = rng.standard_normal((c, d)).astype(np.float32)
    labels = rng.integers(0, c, size=b).astype(np.int32)
    l_dense, _ = margin_softmax_loss(jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels))
    l_stream, m = margin_softmax_loss(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), streaming=True
    )
    assert float(l_stream) == pytest.approx(float(l_dense), rel=1e-4)
    # gradients agree too
    ga = jax.grad(lambda ww: margin_softmax_loss(jnp.asarray(emb), ww, jnp.asarray(labels))[0])(
        jnp.asarray(w)
    )
    gb = jax.grad(
        lambda ww: margin_softmax_loss(
            jnp.asarray(emb), ww, jnp.asarray(labels), streaming=True
        )[0]
    )(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=2e-5)


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_pallas_bwd_interpret_matches_stream(loss_type, rng):
    from vlsfr_tpu.ops.margin_pallas import _stream_bwd, pallas_margin_ce_bwd

    emb, w, labels = make_case(rng, b=8, c=70, d=128)
    gt = compute_gt(emb, w, labels, True)
    kw = dict(loss_type=loss_type, margin=0.5, scale=24.0, k=4, mask_svfc=1.2,
              normalize_w=True, tile=32)
    ce, neg, logz, topk = _stream_fwd(emb, w, labels, gt, **kw)
    d_ce = jnp.asarray(rng.standard_normal(8), jnp.float32)
    d_neg = jnp.asarray(rng.standard_normal(8), jnp.float32)
    # the stream bwd masks cotangents internally; match that behavior
    ge_s, gw_s = _stream_bwd(emb, w, labels, gt, logz, topk, d_ce, d_neg, **kw)
    ge_p, gw_p = pallas_margin_ce_bwd(emb, w, labels, gt, logz, topk, d_ce, d_neg,
                                      interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), atol=2e-5)


def test_pallas_bwd_tile_skip_concentrated(rng):
    """Converged-model distribution (emb ≈ its class weight): most tiles
    carry no softmax mass; the skip-gated Pallas bwd must still match."""
    from vlsfr_tpu.ops.margin_pallas import _stream_bwd, pallas_margin_ce_bwd

    b, c, d = 6, 256, 16
    w = rng.standard_normal((c, d)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    labels = np.arange(b, dtype=np.int32) * 40  # spread across tiles
    emb = w[labels] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    emb, wj, lj = jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels)
    gt = compute_gt(emb, wj, lj, False)
    kw = dict(loss_type="Arc", margin=0.5, scale=48.0, k=3, mask_svfc=1.2,
              normalize_w=False, tile=16)
    ce, neg, logz, topk = _stream_fwd(emb, wj, lj, gt, **kw)
    d_ce = jnp.ones(b, jnp.float32)
    d_neg = jnp.zeros(b, jnp.float32)
    ge_s, gw_s = _stream_bwd(emb, wj, lj, gt, logz, topk, d_ce, d_neg, **kw)
    ge_p, gw_p = pallas_margin_ce_bwd(emb, wj, lj, gt, logz, topk, d_ce, d_neg,
                                      interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_s), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), atol=3e-5)


def test_bf16_weights_mxu_path_close_to_f32(rng):
    """bf16-stored weights switch the kernels to bf16 MXU dots (_mxu_pair).
    With IDENTICAL storage (bf16 rounded w upcast for the f32 reference),
    the only difference is the dot-operand rounding — bounded by ~2^-9 per
    cosine on unit rows. Checks forward values and d_emb stay within that
    budget, and that every f32-path test above is untouched (f32 inputs
    never take this path)."""
    emb, w, labels = make_case(rng, b=8, c=96, d=128)
    w_bf = w.astype(jnp.bfloat16)
    w_up = w_bf.astype(jnp.float32)  # identical values, f32-typed
    kw = dict(loss_type="Arc", margin=0.5, scale=24.0, k=3, mask_svfc=1.2,
              normalize_w=True, tile=32)
    gt_bf = compute_gt(emb, w_bf, labels, True)
    gt_up = compute_gt(emb, w_up, labels, True)
    np.testing.assert_allclose(np.asarray(gt_bf), np.asarray(gt_up), atol=1e-6)
    out_bf = pallas_margin_ce_fwd(emb, w_bf, labels, gt_bf, interpret=True, **kw)
    out_up = _stream_fwd(emb, w_up, labels, gt_up, **kw)
    # ce / neg / logz: |Δz| ≤ scale·|Δcos| ≈ 24·2e-3
    for got, want in zip(out_bf[:3], out_up[:3]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.08)

    from vlsfr_tpu.ops.margin_pallas import _stream_bwd, pallas_margin_ce_bwd

    ce, neg, logz, topk = out_up
    d_ce = jnp.asarray(rng.standard_normal(8), jnp.float32)
    d_neg = jnp.asarray(rng.standard_normal(8), jnp.float32)
    ge_bf, gw_bf = pallas_margin_ce_bwd(emb, w_bf, labels, gt_up, logz, topk,
                                        d_ce, d_neg, interpret=True, **kw)
    ge_up, gw_up = _stream_bwd(emb, w_up, labels, gt_up, logz, topk, d_ce, d_neg, **kw)
    scale_e = np.abs(np.asarray(ge_up)).max()
    np.testing.assert_allclose(np.asarray(ge_bf), np.asarray(ge_up),
                               atol=0.02 * scale_e)
    scale_w = np.abs(np.asarray(gw_up)).max()
    np.testing.assert_allclose(np.asarray(gw_bf).astype(np.float32),
                               np.asarray(gw_up), atol=0.05 * scale_w)


def test_streamed_topk_excludes_target(rng):
    """The streamed top-k must be over NON-target columns: the train_acc
    hit test compares the outside-computed gt against topk[0], and on TPU
    the kernel's own recomputation of the target column rounds differently
    (f32 MXU dots run as bf16 passes) — a target-inclusive top-k silently
    killed ~half the hits on the real chip (round 3). Guard the contract
    where CPU can see it: make the target the GLOBAL max and assert it
    never appears in the streamed top-k."""
    import jax
    import jax.numpy as jnp

    from vlsfr_tpu.ops.margin_pallas import _stream_fwd, pallas_margin_ce_fwd

    b, c, d, k = 8, 256, 32, 3
    w = rng.standard_normal((c, d)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    labels = rng.integers(0, c, size=b).astype(np.int32)
    # emb = exact target row -> gt = 1.0, strictly above every other cosine
    emb = jnp.asarray(w[labels])
    gt = jnp.ones((b,), jnp.float32)
    kw = dict(loss_type="Arc", margin=0.3, scale=16.0, k=k, mask_svfc=1.2,
              normalize_w=False, tile=64)
    for fwd in (_stream_fwd,
                lambda *a, **k2: pallas_margin_ce_fwd(*a, interpret=True, **k2)):
        _, _, _, topk = fwd(emb, jnp.asarray(w), jnp.asarray(labels), gt, **kw)
        topk = np.asarray(topk)
        assert (topk[:, 0] < 0.9999).all(), (
            "target column leaked into the streamed top-k", topk[:, 0])
