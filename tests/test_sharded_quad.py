"""Sharded quad FFC head (parallel/sharded_quad.py): loss and d_emb parity
with the single-shard quad op on the 8-device CPU mesh, for both the scan
fallback and the Pallas partial kernels (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vlsfr_tpu.ops.twin_margin import quad_add_margin
from vlsfr_tpu.parallel.mesh import make_mesh
from vlsfr_tpu.parallel.sharded_quad import make_sharded_quad_loss


def make_case(rng, b=8, q=128, d=16, frac_outlier=0.25):
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def plan():
        rows = rng.integers(0, 2, size=b).astype(np.int32)
        cols = rng.integers(0, q, size=b).astype(np.int32)
        cols[1] = cols[0]
        rows[1] = rows[0]
        seen = (rng.random(b) < 0.7).astype(np.float32)
        labels = rng.integers(0, q, size=b).astype(np.int32)
        labels[rng.random(b) < frac_outlier] = -1
        labels[0] = cols[-1]
        return rows, cols, seen, labels

    emb_x = unit(rng.standard_normal((b, d)).astype(np.float32))
    emb_y = unit(rng.standard_normal((b, d)).astype(np.float32))
    q0 = unit(rng.standard_normal((q, d)).astype(np.float32))
    q1 = unit(rng.standard_normal((q, d)).astype(np.float32))
    g_a = unit(rng.standard_normal((b, d)).astype(np.float32))
    g_b = unit(rng.standard_normal((b, d)).astype(np.float32))
    rowsA, colsA, seenA, labA = plan()
    rowsB, colsB, seenB, labB = plan()
    return (emb_x, emb_y, np.stack([q0, q1]), g_a, g_b,
            (rowsA, colsA, seenA), (rowsB, colsB, seenB), labA, labB)


def place(mesh, case):
    (emb_x, emb_y, queue, g_a, g_b, plan_a, plan_b, labA, labB) = case
    dat = lambda a: jax.device_put(a, NamedSharding(mesh, P("data", *[None] * (a.ndim - 1))))  # noqa: E731
    rep = lambda a: jax.device_put(a, NamedSharding(mesh, P(*[None] * a.ndim)))  # noqa: E731
    qd = jax.device_put(queue, NamedSharding(mesh, P(None, "model", None)))
    return (dat(emb_x), dat(emb_y), qd, rep(g_a), rep(g_b),
            tuple(rep(v) for v in plan_a), tuple(rep(v) for v in plan_b),
            dat(labA), dat(labB))


def ref(case, loss_type, k):
    (emb_x, emb_y, queue, g_a, g_b, plan_a, plan_b, labA, labB) = [
        jax.tree.map(jnp.asarray, c) for c in case]
    la, lb = quad_add_margin(
        emb_x, emb_y, jnp.asarray(queue), g_a, g_b, plan_a, plan_b,
        labA, labB, loss_type=loss_type, margin=0.5, scale=24.0,
        hard_neg=k, tile=16, use_pallas=False)
    return la, lb


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
@pytest.mark.parametrize("pallas", [False, True])
def test_sharded_quad_matches_single(loss_type, pallas, rng):
    mesh = make_mesh(2, 4)
    case = make_case(rng)
    la_ref, lb_ref = ref(case, loss_type, 5)
    kw = dict(loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=5,
              tile=16)
    fn = make_sharded_quad_loss(mesh, use_pallas=pallas, interpret=pallas,
                                **kw)
    placed = place(mesh, case)

    def total(ex, ey):
        la, lb = fn(ex, ey, *placed[2:])
        return la + lb

    (la, lb) = jax.jit(lambda ex, ey: fn(ex, ey, *placed[2:]))(
        placed[0], placed[1])
    assert float(la) == pytest.approx(float(la_ref), rel=1e-4)
    assert float(lb) == pytest.approx(float(lb_ref), rel=1e-4)

    queue_j = jnp.asarray(case[2])
    g_a, g_b = jnp.asarray(case[3]), jnp.asarray(case[4])
    plan_a = tuple(jnp.asarray(v) for v in case[5])
    plan_b = tuple(jnp.asarray(v) for v in case[6])
    labA, labB = jnp.asarray(case[7]), jnp.asarray(case[8])

    def ref_total(ex, ey):
        la, lb = quad_add_margin(
            ex, ey, queue_j, g_a, g_b, plan_a, plan_b, labA, labB,
            loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=5,
            tile=16, use_pallas=False)
        return la + lb

    gx_ref, gy_ref = jax.grad(ref_total, argnums=(0, 1))(
        jnp.asarray(case[0]), jnp.asarray(case[1]))
    gx, gy = jax.jit(jax.grad(total, argnums=(0, 1)))(placed[0], placed[1])
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), atol=3e-5)


def test_sharded_quad_acc(rng):
    mesh = make_mesh(2, 4)
    case = make_case(rng)
    fn = make_sharded_quad_loss(mesh, loss_type="Arc", margin=0.5,
                                scale=24.0, hard_neg=4, tile=16,
                                use_pallas=False, with_acc=True)
    placed = place(mesh, case)
    (la, lb), acc = jax.jit(
        lambda ex, ey: fn(ex, ey, *placed[2:]))(placed[0], placed[1])
    assert np.isfinite(float(la)) and np.isfinite(float(lb))
    assert 0.0 <= float(acc) <= 1.0


@pytest.mark.parametrize("loss_type", ["Arc", "SV"])
@pytest.mark.parametrize("pallas", [False, True])
def test_sharded_quad_int8_matches_single(loss_type, pallas, rng):
    """Int8 queue over the mesh == the single-shard quad on the
    DEQUANTIZED queue (loss + d_emb): exercises the sharded scales
    plumbing (P(None, model) split, localized gathers, the partial
    kernels' scales operand)."""
    from vlsfr_tpu.ops.qqueue import dequant_rows, quantize_rows

    mesh = make_mesh(2, 4)
    case = make_case(rng)
    q_int, q_s = quantize_rows(jnp.asarray(case[2]))
    queue_deq = dequant_rows(q_int, q_s)

    case_deq = (case[0], case[1], np.asarray(queue_deq)) + case[3:]
    la_ref, lb_ref = ref(case_deq, loss_type, 5)

    fn = make_sharded_quad_loss(mesh, loss_type=loss_type, margin=0.5,
                                scale=24.0, hard_neg=5, tile=16,
                                use_pallas=pallas, interpret=pallas)
    placed = place(mesh, case)
    q_l = jax.device_put(q_int, NamedSharding(mesh, P(None, "model", None)))
    s_l = jax.device_put(q_s, NamedSharding(mesh, P(None, "model")))

    def total(ex, ey):
        la, lb = fn(ex, ey, q_l, *placed[3:], qscales=s_l)
        return la + lb

    la, lb = jax.jit(
        lambda ex, ey: fn(ex, ey, q_l, *placed[3:], qscales=s_l))(
        placed[0], placed[1])
    # scan path: identical f32 math on dequantized rows (tight); pallas
    # path: int8 branches run their MXU ops in bf16
    tol = 2e-2 if pallas else 1e-4
    assert float(la) == pytest.approx(float(la_ref), rel=tol, abs=tol)
    assert float(lb) == pytest.approx(float(lb_ref), rel=tol, abs=tol)

    queue_j = jnp.asarray(queue_deq)
    g_a, g_b = jnp.asarray(case[3]), jnp.asarray(case[4])
    plan_a = tuple(jnp.asarray(v) for v in case[5])
    plan_b = tuple(jnp.asarray(v) for v in case[6])
    labA, labB = jnp.asarray(case[7]), jnp.asarray(case[8])

    def ref_total(ex, ey):
        la, lb = quad_add_margin(
            ex, ey, queue_j, g_a, g_b, plan_a, plan_b, labA, labB,
            loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=5,
            tile=16, use_pallas=False)
        return la + lb

    gx_ref, gy_ref = jax.grad(ref_total, argnums=(0, 1))(
        jnp.asarray(case[0]), jnp.asarray(case[1]))
    gx, gy = jax.jit(jax.grad(total, argnums=(0, 1)))(placed[0], placed[1])
    gtol = 2e-2 if pallas else 3e-5
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=gtol, atol=gtol)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               rtol=gtol, atol=gtol)


@pytest.mark.parametrize("loss_type", ["Arc", "SV"])
def test_sharded_quad_int8_compute_matches_single(loss_type, rng):
    """int8-COMPUTE over the mesh (quantized local probes, int8×int8→int32
    clean-tile dots in the partial kernels) vs the SINGLE-SHARD int8-compute
    quad (interpret-mode Pallas both sides). Per-row probe quantization is
    shard-independent and the tile split is identical, so the two paths
    differ only in the f32 merge order of the collective logsumexp — the
    probe-quantization error itself (large at this test's d=16) cancels.
    Float-oracle fidelity of the mode is covered by
    tests/test_qqueue.py::test_quad_int8_compute_matches_oracle."""
    import vlsfr_tpu.ops.twin_margin as tm
    from vlsfr_tpu.ops.qqueue import quantize_rows

    mesh = make_mesh(2, 4)
    case = make_case(rng)
    q_int, q_s = quantize_rows(jnp.asarray(case[2]))

    g_a, g_b = jnp.asarray(case[3]), jnp.asarray(case[4])
    plan_a = tuple(jnp.asarray(v) for v in case[5])
    plan_b = tuple(jnp.asarray(v) for v in case[6])
    labA, labB = jnp.asarray(case[7]), jnp.asarray(case[8])

    orig_fwd, orig_bwd = tm.pallas_quad_fwd, tm.pallas_quad_bwd
    tm.pallas_quad_fwd = lambda *a, **k2: orig_fwd(*a, interpret=True, **k2)
    tm.pallas_quad_bwd = lambda *a, **k2: orig_bwd(*a, interpret=True, **k2)
    try:
        def ref_total(ex, ey):
            la, lb = quad_add_margin(
                ex, ey, q_int, g_a, g_b, plan_a, plan_b, labA, labB,
                loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=5,
                tile=16, use_pallas=True, qscales=q_s, int8_compute=True)
            return la + lb

        l_ref, (gx_ref, gy_ref) = jax.value_and_grad(
            ref_total, argnums=(0, 1))(jnp.asarray(case[0]),
                                       jnp.asarray(case[1]))
    finally:
        tm.pallas_quad_fwd, tm.pallas_quad_bwd = orig_fwd, orig_bwd

    fn = make_sharded_quad_loss(mesh, loss_type=loss_type, margin=0.5,
                                scale=24.0, hard_neg=5, tile=16,
                                use_pallas=True, interpret=True,
                                int8_compute=True)
    placed = place(mesh, case)
    q_l = jax.device_put(q_int, NamedSharding(mesh, P(None, "model", None)))
    s_l = jax.device_put(q_s, NamedSharding(mesh, P(None, "model")))

    def total(ex, ey):
        la, lb = fn(ex, ey, q_l, *placed[3:], qscales=s_l)
        return la + lb

    l_sh, (gx, gy) = jax.jit(jax.value_and_grad(total, argnums=(0, 1)))(
        placed[0], placed[1])
    assert float(l_sh) == pytest.approx(float(l_ref), rel=1e-4, abs=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               rtol=1e-4, atol=1e-4)
