"""Optimizer + schedule tests against reference semantics
(optim/optimizer.py:6-168): warmup math, milestone decay, torch-SGD parity."""

import numpy as np
import pytest

from vlsfr_tpu.config import OptimConfig
from vlsfr_tpu.optim import PlateauController, make_optimizer, make_schedule, set_learning_rate


def cfg(**kw):
    c = OptimConfig()
    for k, v in kw.items():
        setattr(c, k, v)
    return c


def test_multistep_matches_reference_math():
    c = cfg(scheduler="multistep", lr=0.1, epochs=20, warmup_epochs=0,
            milestones=[8, 14, 17], gammas=[0.1, 0.1, 0.1])
    spe = 10
    s = make_schedule(c, spe)
    # epoch 0..7 -> 0.1 ; 8..13 -> 0.01 ; 14..16 -> 0.001 ; 17+ -> 0.0001
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(7 * spe + 3)) == pytest.approx(0.1)
    assert float(s(8 * spe)) == pytest.approx(0.01)
    assert float(s(13 * spe + 9)) == pytest.approx(0.01)
    assert float(s(14 * spe)) == pytest.approx(0.001)
    assert float(s(17 * spe)) == pytest.approx(1e-4)


def test_warmup_fractional():
    """lr = (epoch + iter_frac)/warmup * base during warmup (optimizer.py:87)."""
    c = cfg(scheduler="multistep", lr=0.4, epochs=10, warmup_epochs=2, milestones=[5], gammas=[0.1])
    spe = 4
    s = make_schedule(c, spe)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(1)) == pytest.approx((0 + 0.25) / 2 * 0.4)
    assert float(s(spe)) == pytest.approx((1 + 0.0) / 2 * 0.4)
    assert float(s(spe + 2)) == pytest.approx((1 + 0.5) / 2 * 0.4)
    # first post-warmup epoch: full base lr, milestones relative to warmup end
    assert float(s(2 * spe)) == pytest.approx(0.4)
    assert float(s((2 + 5) * spe)) == pytest.approx(0.04)


def test_cosine():
    c = cfg(scheduler="cos", lr=0.1, epochs=10, warmup_epochs=0, t_max=10, eta_min=0.001)
    s = make_schedule(c, 1)
    assert float(s(0)) == pytest.approx(0.1)
    mid = 0.001 + (0.1 - 0.001) * (1 + np.cos(np.pi * 5 / 10)) / 2
    assert float(s(5)) == pytest.approx(mid, rel=1e-5)
    assert float(s(10)) == pytest.approx(0.001)  # past max_epochs -> eta_min


def test_exponential_and_linear():
    ce = cfg(scheduler="exponential", lr=0.2, epochs=10, warmup_epochs=0, gamma=0.5)
    se = make_schedule(ce, 1)
    assert float(se(3)) == pytest.approx(0.2 * 0.5**3)
    cl = cfg(scheduler="linear", lr=0.2, epochs=10, warmup_epochs=0, lr_min=0.02)
    sl = make_schedule(cl, 1)
    # base * (1 - (max-min)*e/(epochs*max))
    assert float(sl(5)) == pytest.approx(0.2 * (1 - (0.2 - 0.02) * 5 / 10 / 0.2), rel=1e-5)


def test_schedule_is_jittable():
    import jax

    c = cfg(scheduler="multistep", lr=0.1, epochs=20, warmup_epochs=1, milestones=[8], gammas=[0.1])
    s = make_schedule(c, 10)
    jitted = jax.jit(s)
    for step in [0, 5, 10, 95, 150]:
        assert float(jitted(step)) == pytest.approx(float(s(step)))


def test_plateau_controller():
    p = PlateauController(factor=0.1, patience=2, base_lr=0.1, min_lr=1e-4)
    assert p.observe(1.0) == 1.0
    assert p.observe(0.9) == 1.0  # improved
    p.observe(0.95)
    p.observe(0.95)
    scale = p.observe(0.95)  # 3 bad > patience 2 -> decay
    assert scale == pytest.approx(0.1)
    state = p.state_dict()
    q = PlateauController(factor=0.1, patience=2, base_lr=0.1)
    q.load_state_dict(state)
    assert q.scale == scale


def test_sgd_matches_torch(rng):
    """One-param trajectory parity with torch SGD(momentum, wd, nesterov)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=1e-2, nesterov=True)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    c = cfg(optim="SGD", lr=0.1, momentum=0.9, weight_decay=1e-2, nesterov=True)
    opt = make_optimizer(c)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        state = set_learning_rate(state, 0.1)
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-5)


def test_rmsprop_runs():
    import jax.numpy as jnp

    c = cfg(optim="RMSprop", lr=0.01, momentum=0.9, weight_decay=1e-4)
    opt = make_optimizer(c)
    params = {"w": jnp.ones((2, 2))}
    state = opt.init(params)
    updates, state = opt.update({"w": jnp.ones((2, 2))}, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_injected_lr_changes_update_scale():
    import jax.numpy as jnp

    c = cfg(optim="SGD", lr=1.0, momentum=0.0, weight_decay=0.0, nesterov=False)
    opt = make_optimizer(c)
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    g = {"w": jnp.ones(3)}
    state = set_learning_rate(state, 0.5)
    u1, state = opt.update(g, state, params)
    np.testing.assert_allclose(np.asarray(u1["w"]), -0.5)
    state = set_learning_rate(state, 0.25)
    u2, _ = opt.update(g, state, params)
    np.testing.assert_allclose(np.asarray(u2["w"]), -0.25)
