"""Twin-view fused FFC head tests.

Ladder: unfused composition (XLA scatter → blend → two fused_add_margin
calls, itself equivalence-tested against the dense reference) ==
twin scan implementation == twin Pallas kernels (interpreter mode), for
values AND d_emb gradients, across margin families and write patterns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsfr_tpu.core.ffc import scatter_mask
from vlsfr_tpu.ops.margin_pallas import fused_add_margin
from vlsfr_tpu.ops.twin_margin import (
    _twin_stream_bwd,
    _twin_stream_fwd,
    compute_twin_gt,
    fused_twin_margin,
    pallas_twin_bwd,
    pallas_twin_fwd,
    twin_add_margin,
)


def make_case(rng, b=8, q=96, d=16, frac_outlier=0.3, dup_slot=False):
    p = rng.standard_normal((b, d)).astype(np.float32)
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    g = rng.standard_normal((b, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    queue = rng.standard_normal((2, q, d)).astype(np.float32)
    queue /= np.linalg.norm(queue, axis=-1, keepdims=True)
    rows = rng.integers(0, 2, b).astype(np.int32)
    cols = rng.integers(0, q, b).astype(np.int32)
    if dup_slot:  # two samples write the same (row, col) — last-write-wins
        rows[1] = rows[0]
        cols[1] = cols[0]
    seen = (rng.random(b) < 0.5).astype(np.float32)
    labels = cols.copy()  # pool-local labels are the written slots
    labels[rng.random(b) < frac_outlier] = -1
    return (jnp.asarray(p), jnp.asarray(g), jnp.asarray(queue),
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(seen),
            jnp.asarray(labels))


def unfused_loss(p, g, queue, rows, cols, seen, labels, **kw):
    """The reference composition from core/ffc.directional_loss (pre-twin).

    NOTE on duplicates: jnp scatter-set duplicate order is 'last wins' on
    CPU/TPU in practice, matching the kernel's highest-index rule."""
    g = jax.lax.stop_gradient(g)
    new_queue = queue.at[rows, cols].set(g)
    mask = scatter_mask(seen, cols, queue.shape[1])[:, None]
    weight = jax.lax.stop_gradient(mask * new_queue[1] + (1.0 - mask) * new_queue[0])
    loss = fused_add_margin(p, new_queue[0], labels, normalize_w=False,
                            use_pallas=False, tile=16, **kw)
    loss = loss + fused_add_margin(p, weight, labels, normalize_w=False,
                                   use_pallas=False, tile=16, **kw)
    return loss


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
@pytest.mark.parametrize("dup_slot", [False, True])
def test_twin_matches_unfused(loss_type, dup_slot, rng):
    p, g, queue, rows, cols, seen, labels = make_case(rng, dup_slot=dup_slot)
    kw = dict(loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=3)
    want = float(unfused_loss(p, g, queue, rows, cols, seen, labels, **kw))
    got = float(twin_add_margin(p, queue, g, rows, cols, seen,
                                labels, tile=16, use_pallas=False, **kw))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("loss_type", ["Arc", "SV"])
def test_twin_grads_match_unfused(loss_type, rng):
    p, g, queue, rows, cols, seen, labels = make_case(rng)
    kw = dict(loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=3)

    gu = jax.grad(lambda e: unfused_loss(e, g, queue, rows, cols, seen, labels, **kw))(p)
    gt_ = jax.grad(lambda e: twin_add_margin(e, queue, g, rows, cols,
                                             seen, labels, tile=16,
                                             use_pallas=False, **kw))(p)
    np.testing.assert_allclose(np.asarray(gt_), np.asarray(gu), atol=3e-5)


def test_twin_pallas_fwd_matches_scan(rng):
    p, g, queue, rows, cols, seen, labels = make_case(rng, b=8, q=70, d=128)
    kw = dict(loss_type="Arc", margin=0.5, scale=24.0, k=4, mask_svfc=1.2, tile=32)
    gt1, gt2 = compute_twin_gt(p, queue, g, rows, cols, seen, labels)
    out_s, res_s = _twin_stream_fwd(p, queue, g, rows, cols, seen,
                                    labels, gt1, gt2, **kw)
    out_p, res_p = pallas_twin_fwd(p, queue, g, rows, cols, seen,
                                   labels, gt1, gt2, interpret=True, **kw)
    for s, pp in zip(out_s + res_s[:2], out_p + res_p[:2]):
        np.testing.assert_allclose(np.asarray(pp), np.asarray(s), atol=2e-5)
    for s, pp in zip(res_s[2:], res_p[2:]):  # topk
        np.testing.assert_allclose(np.asarray(pp), np.asarray(s), atol=2e-5)


def test_twin_pallas_bwd_matches_scan(rng):
    b = 8
    p, g, queue, rows, cols, seen, labels = make_case(rng, b=b, q=70, d=128)
    kw = dict(loss_type="Arc", margin=0.5, scale=24.0, k=4, mask_svfc=1.2, tile=32)
    gt1, gt2 = compute_twin_gt(p, queue, g, rows, cols, seen, labels)
    _, (logz1, logz2, topk1, topk2) = _twin_stream_fwd(
        p, queue, g, rows, cols, seen, labels, gt1, gt2, **kw)
    d1 = (jnp.asarray(rng.standard_normal(b), jnp.float32),
          jnp.asarray(rng.standard_normal(b), jnp.float32))
    d2 = (jnp.asarray(rng.standard_normal(b), jnp.float32),
          jnp.asarray(rng.standard_normal(b), jnp.float32))
    ge_s = _twin_stream_bwd(p, queue, g, rows, cols, seen, labels,
                            gt1, gt2, logz1, logz2, topk1, topk2, d1, d2, **kw)
    ge_p = pallas_twin_bwd(p, queue, g, rows, cols, seen, labels,
                           gt1, gt2, logz1, logz2, topk1, topk2, d1, d2,
                           interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_s), atol=3e-5)


def test_ffc_directional_loss_twin_matches_dense(rng):
    """core.ffc.directional_loss fused (twin) path == its dense path."""
    from vlsfr_tpu.core.ffc import directional_loss

    b, d, q = 6, 16, 64
    p = rng.standard_normal((b, d)).astype(np.float32)
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    g = rng.standard_normal((b, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    from vlsfr_tpu.core.ffc import init_queue

    queue = init_queue(jax.random.PRNGKey(0), q, d)[0]
    rows = jnp.asarray(rng.integers(0, 2, b), jnp.int32)
    cols = jnp.asarray(rng.integers(0, q, b), jnp.int32)
    seen = jnp.asarray((rng.random(b) < 0.5), jnp.float32)
    fake = jnp.asarray(rng.integers(-1, q, b), jnp.int32)
    kw = dict(loss_type="Arc", margin=0.5, scale=24.0, hard_neg=3)
    l_dense, q_dense = directional_loss(jnp.asarray(p), jnp.asarray(g), queue,
                                        rows, cols, seen, fake, use_fused=False, **kw)
    l_twin, q_twin = directional_loss(jnp.asarray(p), jnp.asarray(g), queue,
                                      rows, cols, seen, fake, use_fused=True, **kw)
    assert float(l_twin) == pytest.approx(float(l_dense), rel=1e-4)
    np.testing.assert_allclose(np.asarray(q_twin), np.asarray(q_dense), atol=1e-7)


def test_twin_no_queue_grad_leak(rng):
    """Grads w.r.t. the queue must be exactly zero (stop-gradient contract)."""
    p, g, queue, rows, cols, seen, labels = make_case(rng)
    kw = dict(loss_type="Arc", margin=0.5, scale=24.0, hard_neg=3)

    def f(q):
        return twin_add_margin(p, q, g, rows, cols, seen, labels,
                               tile=16, use_pallas=False, **kw)

    gq = jax.grad(f)(queue)
    np.testing.assert_array_equal(np.asarray(gq), 0.0)


def test_twin_pallas_bf16_queue_close_to_f32(rng):
    """bf16-stored queue flips the twin kernels to bf16 MXU dots
    (margin_pallas._mxu_pair). With identical storage (the bf16-rounded
    queue upcast for the f32 reference) the only delta is dot-operand
    rounding — bounded by ~2^-9 per cosine on unit rows."""
    p, g, queue, rows, cols, seen, labels = make_case(rng, b=8, q=64, d=128)
    q_bf = queue.astype(jnp.bfloat16)
    q_up = q_bf.astype(jnp.float32)
    g_bf = g  # gallery embeddings stay f32 inputs either way
    kw = dict(loss_type="Arc", margin=0.5, scale=24.0, k=3, mask_svfc=1.2, tile=32)
    gt1, gt2 = compute_twin_gt(p, q_up, g_bf, rows, cols, seen, labels)
    out_up, aux_up = _twin_stream_fwd(p, q_up, g_bf, rows, cols, seen,
                                      labels, gt1, gt2, **kw)
    out_bf, aux_bf = pallas_twin_fwd(p, q_bf, g_bf, rows, cols, seen,
                                     labels, gt1, gt2, interpret=True, **kw)
    for got, want in zip(out_bf, out_up):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.08)
    logz1, logz2, topk1, topk2 = aux_up
    d1 = (jnp.asarray(rng.standard_normal(8), jnp.float32),
          jnp.asarray(rng.standard_normal(8), jnp.float32))
    d2 = (jnp.asarray(rng.standard_normal(8), jnp.float32),
          jnp.asarray(rng.standard_normal(8), jnp.float32))
    ge_up = _twin_stream_bwd(p, q_up, g_bf, rows, cols, seen, labels,
                             gt1, gt2, logz1, logz2, topk1, topk2, d1, d2, **kw)
    ge_bf = pallas_twin_bwd(p, q_bf, g_bf, rows, cols, seen, labels,
                            gt1, gt2, logz1, logz2, topk1, topk2, d1, d2,
                            interpret=True, **kw)
    scale_e = np.abs(np.asarray(ge_up)).max()
    np.testing.assert_allclose(np.asarray(ge_bf), np.asarray(ge_up),
                               atol=0.03 * scale_e)


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_quad_matches_two_twins(use_pallas, loss_type, rng):
    """quad (both directions, one pass) == two independent twin calls:
    losses AND d_emb grads, scan and interpret-Pallas paths. Covers the
    shared-stream bodies (Arc/AM) and the SV two-stream fallback."""
    from vlsfr_tpu.ops.twin_margin import quad_add_margin

    p_x, g_a, queue, rows_a, cols_a, seen_a, labels_a = make_case(rng)
    p_y, g_b, _, rows_b, cols_b, seen_b, labels_b = make_case(rng)
    kw = dict(loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=3,
              tile=16)
    interp = dict(use_pallas="auto") if not use_pallas else dict(use_pallas=True)
    if use_pallas:
        # interpret-mode pallas on CPU: route through the pallas fns directly
        import vlsfr_tpu.ops.twin_margin as tm
        orig_fwd, orig_bwd = tm.pallas_quad_fwd, tm.pallas_quad_bwd
        tm_fwd = lambda *a, **k: orig_fwd(*a, **dict(k, interpret=True))  # noqa: E731
        tm_bwd = lambda *a, **k: orig_bwd(*a, **dict(k, interpret=True))  # noqa: E731
        tm.pallas_quad_fwd, tm.pallas_quad_bwd = tm_fwd, tm_bwd
        tw_fwd, tw_bwd = tm.pallas_twin_fwd, tm.pallas_twin_bwd
        tm.pallas_twin_fwd = lambda *a, **k: tw_fwd(*a, **dict(k, interpret=True))
        tm.pallas_twin_bwd = lambda *a, **k: tw_bwd(*a, **dict(k, interpret=True))
        interp = dict(use_pallas=True)
    try:
        def quad_losses(px, py):
            la, lb = quad_add_margin(
                px, py, queue, g_a, g_b, (rows_a, cols_a, seen_a),
                (rows_b, cols_b, seen_b), labels_a, labels_b, **kw, **interp)
            return la, lb

        def twin_losses(px, py):
            la = twin_add_margin(px, queue, g_a, rows_a, cols_a, seen_a,
                                 labels_a, **kw, **interp)
            lb = twin_add_margin(py, queue, g_b, rows_b, cols_b, seen_b,
                                 labels_b, **kw, **interp)
            return la, lb

        la_q, lb_q = quad_losses(p_x, p_y)
        la_t, lb_t = twin_losses(p_x, p_y)
        np.testing.assert_allclose(float(la_q), float(la_t), rtol=1e-5)
        np.testing.assert_allclose(float(lb_q), float(lb_t), rtol=1e-5)

        gx_q, gy_q = jax.grad(lambda px, py: sum(quad_losses(px, py)),
                              argnums=(0, 1))(p_x, p_y)
        gx_t, gy_t = jax.grad(lambda px, py: sum(twin_losses(px, py)),
                              argnums=(0, 1))(p_x, p_y)
        np.testing.assert_allclose(np.asarray(gx_q), np.asarray(gx_t), atol=3e-6)
        np.testing.assert_allclose(np.asarray(gy_q), np.asarray(gy_t), atol=3e-6)
    finally:
        if use_pallas:
            tm.pallas_quad_fwd, tm.pallas_quad_bwd = orig_fwd, orig_bwd
            tm.pallas_twin_fwd, tm.pallas_twin_bwd = tw_fwd, tw_bwd



@pytest.mark.parametrize("scale", [32.0, 64.0])
def test_quad_fixed_ref_matches_running_max(scale, rng):
    """The fixed-reference z-unit shared stream (scale ≤ 40 selects
    _quad_dir_fwd_shared_zfix) and the running-max body (scale 64 keeps
    the original — exp(z − scale) would underflow past ~2·40) agree with
    the scan composition on losses, grads, and the streamed top-k-driven
    accuracy, interpret-mode Pallas vs scan."""
    from vlsfr_tpu.ops import twin_margin as tm

    p_x, g_a, queue, rows_a, cols_a, seen_a, labels_a = make_case(rng)
    p_y, g_b, _, rows_b, cols_b, seen_b, labels_b = make_case(rng)
    kw = dict(loss_type="Arc", margin=0.5, scale=scale, hard_neg=3, tile=16,
              with_acc=True)
    args = (queue, g_a, g_b, (rows_a, cols_a, seen_a),
            (rows_b, cols_b, seen_b), labels_a, labels_b)

    orig_fwd, orig_bwd = tm.pallas_quad_fwd, tm.pallas_quad_bwd
    tm.pallas_quad_fwd = lambda *a, **k: orig_fwd(*a, **dict(k, interpret=True))
    tm.pallas_quad_bwd = lambda *a, **k: orig_bwd(*a, **dict(k, interpret=True))
    try:
        def total(px, py, use_pallas):
            (la, lb), acc = tm.quad_add_margin(px, py, *args,
                                               use_pallas=use_pallas, **kw)
            return la + lb, acc

        (l_p, acc_p), (gx_p, gy_p) = jax.value_and_grad(
            total, argnums=(0, 1), has_aux=True)(p_x, p_y, True)
        (l_s, acc_s), (gx_s, gy_s) = jax.value_and_grad(
            total, argnums=(0, 1), has_aux=True)(p_x, p_y, False)
    finally:
        tm.pallas_quad_fwd, tm.pallas_quad_bwd = orig_fwd, orig_bwd

    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-5)
    np.testing.assert_allclose(float(acc_p), float(acc_s), atol=1e-7)
    # the fixed reference reorders the logsumexp accumulation, so grads
    # carry an extra ~1e-7 relative shift vs the running-max scan
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_s), atol=1e-5)


@pytest.mark.parametrize("mode", ["f32", "int8", "int8c"])
def test_quad_stacked_matches(mode, rng):
    """The both-directions-stacked clean-tile fast path (_STACKED) is
    BIT-identical to the per-direction zfix bodies: the stacked [2B, tile]
    dot/exp/sum/top-k are row-wise, and written/final tiles route to the
    per-direction path. Write plans are confined to tile 0 so the other
    tiles genuinely exercise the stacked branch."""
    from vlsfr_tpu.ops import twin_margin as tm

    p_x, g_a, queue, rows_a, cols_a, seen_a, labels_a = make_case(rng)
    p_y, g_b, _, rows_b, cols_b, seen_b, labels_b = make_case(rng)
    # confine writes (and in-pool labels) to the first 16-wide tile
    cols_a, cols_b = cols_a % 16, cols_b % 16
    labels_a = jnp.where(labels_a >= 0, cols_a, -1)
    labels_b = jnp.where(labels_b >= 0, cols_b, -1)
    qscales = None
    if mode in ("int8", "int8c"):
        from vlsfr_tpu.ops.qqueue import quantize_rows

        q8, qs = quantize_rows(queue.reshape(-1, queue.shape[-1]))
        queue = q8.reshape(queue.shape)
        qscales = qs.reshape(queue.shape[:2])
    kw = dict(loss_type="Arc", margin=0.5, scale=32.0, hard_neg=3, tile=16,
              qscales=qscales, int8_compute=mode == "int8c", with_acc=True)
    args = (queue, g_a, g_b, (rows_a, cols_a, seen_a),
            (rows_b, cols_b, seen_b), labels_a, labels_b)

    orig_fwd, orig_bwd = tm.pallas_quad_fwd, tm.pallas_quad_bwd
    tm.pallas_quad_fwd = lambda *a, **k: orig_fwd(*a, **dict(k, interpret=True))
    tm.pallas_quad_bwd = lambda *a, **k: orig_bwd(*a, **dict(k, interpret=True))
    try:
        def total(px, py):
            (la, lb), acc = tm.quad_add_margin(px, py, *args,
                                               use_pallas=True, **kw)
            return la + lb, acc

        results = {}
        for stacked in (False, True):
            # pin BOTH flags: under the "auto" default _STACKED_AUTO would
            # route int8c through the stacked path even in the off leg
            orig_flag = tm._STACKED, tm._STACKED_AUTO
            tm._STACKED, tm._STACKED_AUTO = stacked, False
            try:
                results[stacked] = jax.value_and_grad(
                    total, argnums=(0, 1), has_aux=True)(p_x, p_y)
            finally:
                tm._STACKED, tm._STACKED_AUTO = orig_flag
    finally:
        tm.pallas_quad_fwd, tm.pallas_quad_bwd = orig_fwd, orig_bwd

    (l0, acc0), (gx0, gy0) = results[False]
    (l1, acc1), (gx1, gy1) = results[True]
    assert float(l0) == float(l1)
    assert float(acc0) == float(acc1)
    np.testing.assert_array_equal(np.asarray(gx0), np.asarray(gx1))
    np.testing.assert_array_equal(np.asarray(gy0), np.asarray(gy1))


@pytest.mark.parametrize("mode", ["f32", "int8c"])
@pytest.mark.parametrize("stacked", [False, True])
def test_merge_probe_matches_full(mode, stacked, rng):
    """The two-stage merge probe (_merge_tile_topk, k > probe_m) is
    BIT-identical to the always-full extraction: only tile values > kth
    can change merged top-k VALUES, and the deep fallback catches rows
    where more than probe_m qualify. hard_neg=6 > probe_m=4 engages the
    probe; the NEG_INF-initialized buffers force the deep fallback on
    each buffer's first firing tile and random later tiles exercise the
    probe-only branch. For f32 the result is also checked against the
    scan reference (the int8c scan fallback rounds differently at the
    ~5e-3 level — tests/test_qqueue.py owns that comparison)."""
    from vlsfr_tpu.ops import twin_margin as tm

    p_x, g_a, queue, rows_a, cols_a, seen_a, labels_a = make_case(rng)
    p_y, g_b, _, rows_b, cols_b, seen_b, labels_b = make_case(rng)
    qscales = None
    if mode == "int8c":
        from vlsfr_tpu.ops.qqueue import quantize_rows

        q8, qs = quantize_rows(queue.reshape(-1, queue.shape[-1]))
        queue = q8.reshape(queue.shape)
        qscales = qs.reshape(queue.shape[:2])
    kw = dict(loss_type="Arc", margin=0.5, scale=32.0, hard_neg=6, tile=16,
              qscales=qscales, int8_compute=mode == "int8c", with_acc=True)
    args = (queue, g_a, g_b, (rows_a, cols_a, seen_a),
            (rows_b, cols_b, seen_b), labels_a, labels_b)

    def total(px, py, pallas):
        (la, lb), acc = tm.quad_add_margin(px, py, *args,
                                           use_pallas=pallas, **kw)
        return la + lb, acc

    orig_fwd, orig_bwd = tm.pallas_quad_fwd, tm.pallas_quad_bwd
    tm.pallas_quad_fwd = lambda *a, **k: orig_fwd(*a, **dict(k, interpret=True))
    tm.pallas_quad_bwd = lambda *a, **k: orig_bwd(*a, **dict(k, interpret=True))
    orig_flag = tm._STACKED, tm._STACKED_AUTO
    orig_merge = tm._merge_tile_topk
    tm._STACKED, tm._STACKED_AUTO = stacked, False
    results = {}
    try:
        for pm in (4, 99):  # 99 > tile+k: the probe can never satisfy, full always
            tm._merge_tile_topk = (
                lambda zm, kth, scrs, k, _pm=pm, _o=orig_merge:
                _o(zm, kth, scrs, k, probe_m=_pm))
            results[pm] = jax.value_and_grad(
                total, argnums=(0, 1), has_aux=True)(p_x, p_y, True)
        if mode == "f32":
            results["scan"] = jax.value_and_grad(
                total, argnums=(0, 1), has_aux=True)(p_x, p_y, False)
    finally:
        tm._merge_tile_topk = orig_merge
        tm._STACKED, tm._STACKED_AUTO = orig_flag
        tm.pallas_quad_fwd, tm.pallas_quad_bwd = orig_fwd, orig_bwd

    (l_p, acc_p), (gx_p, gy_p) = results[4]
    (l_f, acc_f), (gx_f, gy_f) = results[99]
    assert float(l_p) == float(l_f)
    assert float(acc_p) == float(acc_f)
    np.testing.assert_array_equal(np.asarray(gx_p), np.asarray(gx_f))
    np.testing.assert_array_equal(np.asarray(gy_p), np.asarray(gy_f))
    if mode == "f32":
        (l_s, acc_s), (gx_s, gy_s) = results["scan"]
        np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-5)
        np.testing.assert_allclose(float(acc_p), float(acc_s), atol=1e-7)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_s), atol=1e-5)
