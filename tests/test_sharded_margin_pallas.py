"""Pallas-backed sharded streaming softmax (parallel/sharded_margin.py
use_pallas=True, interpret mode): per-shard kernel partials must reproduce
the scan composition's loss, d_emb AND d_w on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from vlsfr_tpu.parallel.mesh import make_mesh
from vlsfr_tpu.parallel.sharded_margin import make_sharded_streaming_loss
from tests.test_sharded_margin import make_case, place


def both_paths(mesh, case, loss_type, k, grad_w=True, tile=16):
    e, w, l = place(mesh, *case)
    kw = dict(loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=k,
              tile=tile, grad_w=grad_w)
    out = {}
    for name, path_kw in (("scan", dict(use_pallas=False)),
                          ("pallas", dict(use_pallas=True, interpret=True))):
        fn = make_sharded_streaming_loss(mesh, **kw, **path_kw)
        if grad_w:
            (loss, _aux), (ge, gw) = jax.jit(
                jax.value_and_grad(lambda ee, ww: fn(ee, ww, l), argnums=(0, 1),
                                   has_aux=True))(e, w)
            out[name] = (float(loss), np.asarray(ge), np.asarray(gw))
        else:
            (loss, _aux), ge = jax.jit(
                jax.value_and_grad(lambda ee: fn(ee, w, l), has_aux=True))(e)
            out[name] = (float(loss), np.asarray(ge), None)
    return out["scan"], out["pallas"]


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_pallas_shard_matches_scan(loss_type, rng):
    mesh = make_mesh(2, 4)
    case = make_case(rng)
    (l_s, ge_s, gw_s), (l_p, ge_p, gw_p) = both_paths(mesh, case, loss_type, 5)
    assert l_p == pytest.approx(l_s, rel=1e-5)
    np.testing.assert_allclose(ge_p, ge_s, atol=2e-6)
    np.testing.assert_allclose(gw_p, gw_s, atol=2e-6)


def test_pallas_shard_grad_w_false(rng):
    mesh = make_mesh(2, 4)
    case = make_case(rng)
    (l_s, ge_s, _), (l_p, ge_p, _) = both_paths(mesh, case, "Arc", 4,
                                                grad_w=False)
    assert l_p == pytest.approx(l_s, rel=1e-5)
    np.testing.assert_allclose(ge_p, ge_s, atol=2e-6)


def test_pallas_shard_all_outliers(rng):
    mesh = make_mesh(2, 4)
    emb, w, labels = make_case(rng)
    labels = np.full_like(labels, -1)
    (l_s, ge_s, gw_s), (l_p, ge_p, gw_p) = both_paths(
        mesh, (emb, w, labels), "Arc", 4)
    assert l_p == pytest.approx(l_s, rel=1e-5)
    np.testing.assert_allclose(ge_p, ge_s, atol=2e-6)
    np.testing.assert_allclose(gw_p, gw_s, atol=2e-6)
