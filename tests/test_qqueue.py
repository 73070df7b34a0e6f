"""Int8 DCP queue storage (ops/qqueue.py + the quad/scan int8 paths).

CPU-only (conftest pins the backend): the Pallas kernels run in interpret
mode here; the real-chip compile/perf check is tools/bench_int8_queue.py
(docs/PERF.md round 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsfr_tpu.ops.qqueue import dequant_rows, quantize_rows


def _unit_rows(key, shape):
    x = jax.random.normal(key, shape, jnp.float32)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


class TestQuantizeRows:
    def test_unit_norm_and_cosine(self):
        x = _unit_rows(jax.random.PRNGKey(0), (256, 512))
        q, s = quantize_rows(x)
        assert q.dtype == jnp.int8
        deq = dequant_rows(q, s)
        nrm = np.linalg.norm(np.asarray(deq), axis=-1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
        cos = np.sum(np.asarray(x) * np.asarray(deq), axis=-1)
        # expected drift ~4e-5 at D=512; bound it at 4x that
        assert cos.min() > 1.0 - 2e-4, cos.min()

    def test_unnormalized_input_renormalizes(self):
        # quantize_rows discards the input norm by contract
        x = 3.7 * _unit_rows(jax.random.PRNGKey(1), (8, 64))
        q, s = quantize_rows(x)
        nrm = np.linalg.norm(np.asarray(dequant_rows(q, s)), axis=-1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-5)

    def test_zero_row(self):
        q, s = quantize_rows(jnp.zeros((3, 16)))
        assert np.all(np.asarray(s) == 0.0)
        assert np.all(np.asarray(dequant_rows(q, s)) == 0.0)

    def test_requantize_fixed_point(self):
        # a dequantized row re-quantizes to itself (same int pattern):
        # repeated admission of the same embedding is drift-free
        x = _unit_rows(jax.random.PRNGKey(2), (32, 128))
        q1, s1 = quantize_rows(x)
        q2, s2 = quantize_rows(dequant_rows(q1, s1))
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def _plan(key, b, q):
    kc, kr, ks, kl = jax.random.split(key, 4)
    cols = jax.random.randint(kc, (b,), 0, q)
    rows = jax.random.randint(kr, (b,), 0, 2)
    seen = (jax.random.uniform(ks, (b,)) < 0.5).astype(jnp.float32)
    # ~1/4 outliers (label -1)
    labels = jnp.where(jax.random.uniform(kl, (b,)) < 0.25, -1, cols)
    return rows, cols, seen, labels


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_quad_int8_matches_dequantized_oracle(loss_type, use_pallas):
    """The int8 quad path == the float path run on the dequantized queue.

    The quantization itself is exercised (int8 storage in, per-row scales),
    while the oracle removes it as a variable — any mismatch is a bug in
    the scales plumbing, the post-dot lane scaling, or the written-tile
    cos-level overrides. bf16 tolerance: the int8 path runs its MXU ops in
    bf16 (like bf16 queues); the oracle runs f32."""
    from vlsfr_tpu.ops.twin_margin import quad_add_margin

    b, q, d, tile = 16, 512, 128, 128
    key = jax.random.PRNGKey(42)
    kq, ke1, ke2, kg1, kg2, kp1, kp2 = jax.random.split(key, 7)
    queue_f = _unit_rows(kq, (2, q, d))
    q_int, q_s = quantize_rows(queue_f)
    queue_deq = dequant_rows(q_int, q_s)

    emb_x = _unit_rows(ke1, (b, d))
    emb_y = _unit_rows(ke2, (b, d))
    g_a = _unit_rows(kg1, (b, d))
    g_b = _unit_rows(kg2, (b, d))
    rowsA, colsA, seenA, labA = _plan(kp1, b, q)
    rowsB, colsB, seenB, labB = _plan(kp2, b, q)

    kw = dict(loss_type=loss_type, margin=0.3, scale=16.0, hard_neg=5,
              tile=tile, use_pallas=use_pallas)
    if use_pallas:
        # interpret-mode Pallas on CPU
        import vlsfr_tpu.ops.twin_margin as tm

        orig_fwd, orig_bwd = tm.pallas_quad_fwd, tm.pallas_quad_bwd
        tm.pallas_quad_fwd = lambda *a, **k2: orig_fwd(*a, interpret=True, **k2)
        tm.pallas_quad_bwd = lambda *a, **k2: orig_bwd(*a, interpret=True, **k2)
    try:
        def loss_int8(ex, ey):
            (la, lb) = quad_add_margin(
                ex, ey, q_int, g_a, g_b, (rowsA, colsA, seenA),
                (rowsB, colsB, seenB), labA, labB, qscales=q_s, **kw)
            return la + lb

        def loss_oracle(ex, ey):
            (la, lb) = quad_add_margin(
                ex, ey, queue_deq, g_a, g_b, (rowsA, colsA, seenA),
                (rowsB, colsB, seenB), labA, labB, **kw)
            return la + lb

        if use_pallas:
            l8, g8 = jax.value_and_grad(loss_int8, argnums=(0, 1))(emb_x, emb_y)
            lo, go = jax.value_and_grad(loss_oracle, argnums=(0, 1))(emb_x, emb_y)
        else:
            l8, g8 = jax.jit(jax.value_and_grad(loss_int8, argnums=(0, 1)))(emb_x, emb_y)
            lo, go = jax.jit(jax.value_and_grad(loss_oracle, argnums=(0, 1)))(emb_x, emb_y)
    finally:
        if use_pallas:
            tm.pallas_quad_fwd, tm.pallas_quad_bwd = orig_fwd, orig_bwd

    # scan fallback runs the identical f32 math on the dequantized values →
    # tight; the Pallas int8 path rounds MXU operands to bf16
    tol = 2e-2 if use_pallas else 1e-5
    np.testing.assert_allclose(float(l8), float(lo), rtol=tol, atol=tol)
    for a, o in zip(g8, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                                   rtol=tol, atol=tol)



def test_ffc_step_int8_e2e():
    """End-to-end FFC train step with an int8 queue: loss finite and
    decreasing over steps, queue stays int8, written slots carry the
    quantized fresh embeddings, scales stay unit-norm consistent."""
    from vlsfr_tpu.config import Config
    from vlsfr_tpu.core.dcp import DCPManager
    from vlsfr_tpu.core.ffc import create_ffc_state, make_train_step
    from vlsfr_tpu.models import create_net, native_image_size
    from vlsfr_tpu.optim import make_optimizer, make_schedule

    cfg = Config()
    cfg.model.net_type = "toy"
    cfg.model.feat_dim = 128
    cfg.pool.queue_size = 512
    cfg.pool.queue_dtype = "int8"
    cfg.pool.use_fused = "on"
    cfg.data.batch_size = 8
    size = native_image_size("toy")

    model = create_net("toy", feat_dim=cfg.model.feat_dim)
    optimizer = make_optimizer(cfg.optim)
    schedule = make_schedule(cfg.optim, steps_per_epoch=10)
    state = create_ffc_state(jax.random.PRNGKey(0), model, cfg, optimizer, size)
    assert state.queue.dtype == jnp.int8
    assert state.queue_scales.shape == (2, cfg.pool.queue_size)

    step = jax.jit(make_train_step(model, cfg, optimizer, schedule),
                   donate_argnums=0)
    mgr = DCPManager(cfg.pool.queue_size)
    rng = np.random.default_rng(0)
    b = cfg.data.batch_size
    losses = []
    for i in range(6):
        labels = rng.integers(0, 40, size=b)
        idx = mgr.plan_step(labels, labels)
        x = jnp.asarray(rng.standard_normal((b, size, size, 3)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((b, size, size, 3)), jnp.float32)
        state, m = step(state, x, y, idx, 1.0)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert state.queue.dtype == jnp.int8
    # every row of the final queue dequantizes unit-norm (or is all-zero)
    deq = dequant_rows(jnp.asarray(state.queue), jnp.asarray(state.queue_scales))
    nrm = np.linalg.norm(np.asarray(deq), axis=-1)
    live = nrm > 0
    np.testing.assert_allclose(nrm[live], 1.0, atol=1e-4)


def test_int8_dense_path_rejected():
    from vlsfr_tpu.config import Config
    from vlsfr_tpu.core.ffc import make_ffc_loss_fn
    from vlsfr_tpu.models import create_net

    cfg = Config()
    cfg.pool.queue_dtype = "int8"
    cfg.pool.use_fused = "off"
    with pytest.raises(ValueError, match="int8"):
        make_ffc_loss_fn(create_net("toy", feat_dim=64), cfg)


def test_queue_tile_must_divide():
    from vlsfr_tpu.config import Config
    from vlsfr_tpu.core.ffc import make_ffc_loss_fn
    from vlsfr_tpu.models import create_net

    cfg = Config()
    cfg.pool.use_fused = "on"
    cfg.pool.queue_size = 4096
    cfg.pool.queue_tile = 768  # does not divide 4096
    with pytest.raises(ValueError, match="queue_tile"):
        make_ffc_loss_fn(create_net("toy", feat_dim=64), cfg)


def test_twin_tile_int8_clamp_wider():
    """The VMEM clamp admits wider tiles for narrower queue dtypes: the
    double-buffered tile bytes scale with itemsize while the [B, tile] f32
    working set does not (ops/twin_margin._twin_tile)."""
    from vlsfr_tpu.ops.twin_margin import _twin_tile

    b, d = 128, 512
    f32 = _twin_tile(b, d, 4096, qbytes=4)
    bf16 = _twin_tile(b, d, 4096, qbytes=2)
    i8 = _twin_tile(b, d, 4096, qbytes=1)
    assert f32 == 1024  # the measured round-2/3 clamp is unchanged
    assert i8 > bf16 > f32


@pytest.mark.parametrize("loss_type", ["Arc", "SV"])
def test_quad_int8_compute_matches_oracle(loss_type):
    """int8-COMPUTE mode (int8xint8->int32 streamed dots, quantized probes)
    vs the float path on the dequantized queue: the only extra error source
    is the probes' per-row quantization (~1e-4 on cos), so the tolerance is
    TIGHTER than the bf16-dot path's. Interpret-mode Pallas on CPU."""
    import vlsfr_tpu.ops.twin_margin as tm
    from vlsfr_tpu.ops.twin_margin import quad_add_margin

    b, q, d, tile = 16, 512, 128, 128
    key = jax.random.PRNGKey(7)
    kq, ke1, ke2, kg1, kg2, kp1, kp2 = jax.random.split(key, 7)
    queue_f = _unit_rows(kq, (2, q, d))
    q_int, q_s = quantize_rows(queue_f)
    queue_deq = dequant_rows(q_int, q_s)
    emb_x = _unit_rows(ke1, (b, d))
    emb_y = _unit_rows(ke2, (b, d))
    g_a = _unit_rows(kg1, (b, d))
    g_b = _unit_rows(kg2, (b, d))
    rowsA, colsA, seenA, labA = _plan(kp1, b, q)
    rowsB, colsB, seenB, labB = _plan(kp2, b, q)

    kw = dict(loss_type=loss_type, margin=0.3, scale=16.0, hard_neg=5,
              tile=tile)
    orig_fwd, orig_bwd = tm.pallas_quad_fwd, tm.pallas_quad_bwd
    tm.pallas_quad_fwd = lambda *a, **k2: orig_fwd(*a, interpret=True, **k2)
    tm.pallas_quad_bwd = lambda *a, **k2: orig_bwd(*a, interpret=True, **k2)
    try:
        def loss_i8c(ex, ey):
            la, lb = quad_add_margin(
                ex, ey, q_int, g_a, g_b, (rowsA, colsA, seenA),
                (rowsB, colsB, seenB), labA, labB, qscales=q_s,
                int8_compute=True, use_pallas=True, **kw)
            return la + lb

        def loss_oracle(ex, ey):
            la, lb = quad_add_margin(
                ex, ey, queue_deq, g_a, g_b, (rowsA, colsA, seenA),
                (rowsB, colsB, seenB), labA, labB, use_pallas=False, **kw)
            return la + lb

        l8, g8 = jax.value_and_grad(loss_i8c, argnums=(0, 1))(emb_x, emb_y)
        lo, go = jax.value_and_grad(loss_oracle, argnums=(0, 1))(emb_x, emb_y)
    finally:
        tm.pallas_quad_fwd, tm.pallas_quad_bwd = orig_fwd, orig_bwd

    np.testing.assert_allclose(float(l8), float(lo), rtol=5e-3, atol=5e-3)
    for a, o in zip(g8, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                                   rtol=1e-2, atol=1e-2)


def test_int8_compute_requires_int8_queue():
    from vlsfr_tpu.ops.twin_margin import quad_add_margin

    b, q, d = 4, 64, 32
    z = jnp.zeros((b, d))
    queue = jnp.zeros((2, q, d))
    plan = (jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,)))
    lab = jnp.zeros((b,), jnp.int32)
    with pytest.raises(ValueError, match="int8_compute"):
        quad_add_margin(z, z, queue, z, z, plan, plan, lab, lab,
                        int8_compute=True)
