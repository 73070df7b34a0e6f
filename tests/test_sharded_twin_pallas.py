"""Pallas-backed sharded twin head (parallel/sharded_twin.py use_pallas=True,
interpret mode): per-shard kernel partials must reproduce the scan
composition's loss and d_emb exactly on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsfr_tpu.parallel.mesh import make_mesh
from vlsfr_tpu.parallel.sharded_twin import make_sharded_twin_loss
from tests.test_sharded_twin import make_case, place


def both_paths(mesh, case, loss_type, k, tile=16, queue_dtype=None):
    placed = list(place(mesh, *case))
    if queue_dtype is not None:
        placed[1] = placed[1].astype(queue_dtype)
    kw = dict(loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=k, tile=tile)
    scan_fn = make_sharded_twin_loss(mesh, use_pallas=False, **kw)
    pallas_fn = make_sharded_twin_loss(mesh, use_pallas=True, interpret=True, **kw)
    emb, rest = placed[0], placed[1:]
    l_s, g_s = jax.jit(jax.value_and_grad(lambda e: scan_fn(e, *rest)))(emb)
    l_p, g_p = jax.jit(jax.value_and_grad(lambda e: pallas_fn(e, *rest)))(emb)
    return (float(l_s), np.asarray(g_s)), (float(l_p), np.asarray(g_p))


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_pallas_shard_matches_scan(loss_type, rng):
    mesh = make_mesh(2, 4)
    case = make_case(rng)
    (l_s, g_s), (l_p, g_p) = both_paths(mesh, case, loss_type, 5)
    assert l_p == pytest.approx(l_s, rel=1e-5)
    np.testing.assert_allclose(g_p, g_s, atol=2e-6)


def test_pallas_shard_bf16_queue(rng):
    """bf16 queue selects the bf16 MXU path in BOTH bodies. The rounding
    points differ (the kernel rounds d_cos before its d_emb dots and sums
    the two views pre-rounding on clean tiles; the scan accumulates in
    f32), so agreement is to bf16 noise — the exact-equivalence proof is
    the f32 test above."""
    mesh = make_mesh(2, 4)
    case = make_case(rng)
    (l_s, g_s), (l_p, g_p) = both_paths(mesh, case, "Arc", 4,
                                        queue_dtype=jnp.bfloat16)
    assert l_p == pytest.approx(l_s, rel=1e-3)
    np.testing.assert_allclose(g_p, g_s, atol=0.03)


def test_pallas_shard_all_outliers(rng):
    mesh = make_mesh(2, 4)
    emb, q0, q1, g, rows, cols, seen, labels = make_case(rng, dup_col=False)
    labels = np.full_like(labels, -1)
    case = (emb, q0, q1, g, rows, cols, seen, labels)
    (l_s, g_s), (l_p, g_p) = both_paths(mesh, case, "Arc", 4)
    assert l_p == pytest.approx(l_s, rel=1e-5)
    np.testing.assert_allclose(g_p, g_s, atol=2e-6)
