"""Golden-value tests for the margin losses (reference ffc.py:60-138).

Oracle: independent numpy implementation of the reference math (AM/Arc/SV
margin CE over positive rows + mean top-k clipped cosine over outlier rows).
"""

import math

import numpy as np
import pytest

from vlsfr_tpu.ops.margin import add_margin, default_hard_neg, margin_logits


def np_softmax_ce(logits, labels):
    """Mean cross-entropy, numerically stable."""
    m = logits.max(axis=1, keepdims=True)
    logz = m[:, 0] + np.log(np.exp(logits - m).sum(axis=1))
    return float(np.mean(logz - logits[np.arange(len(labels)), labels]))


def oracle_loss(cos, label, loss_type, margin, scale, hard_neg, mask_svfc=1.2):
    cos = cos.astype(np.float64)
    pos_idx = np.where(label != -1)[0]
    out_idx = np.where(label == -1)[0]
    cls_loss = 0.0
    if len(pos_idx):
        pc = cos[pos_idx].copy()
        pl = label[pos_idx]
        gt = pc[np.arange(len(pl)), pl].copy()
        if loss_type == "AM":
            pc[np.arange(len(pl)), pl] = gt - margin
        elif loss_type == "Arc":
            sin = np.sqrt(np.maximum(1 - gt**2, 0))
            pc[np.arange(len(pl)), pl] = gt * math.cos(margin) - sin * math.sin(margin)
        else:  # SV
            hard = pc > (gt[:, None] - margin)
            pc[hard] = mask_svfc * pc[hard] + mask_svfc - 1.0
            final_gt = np.where(gt > margin, gt - margin, gt)
            pc[np.arange(len(pl)), pl] = final_gt
        cls_loss = np_softmax_ce(pc * scale, pl)
    neg_loss = 0.0
    if len(out_idx):
        oc = cos[out_idx]
        k = min(hard_neg, oc.shape[1])
        topk = np.sort(oc, axis=1)[:, ::-1][:, :k]
        neg_loss = float(np.mean(np.clip(topk, 0, None)))
    return cls_loss + neg_loss


def make_batch(rng, b, q, frac_outlier=0.3):
    cos = rng.uniform(-1, 1, size=(b, q)).astype(np.float32)
    label = rng.integers(0, q, size=b).astype(np.int32)
    outliers = rng.random(b) < frac_outlier
    label[outliers] = -1
    return cos, label


@pytest.mark.parametrize("loss_type", ["AM", "Arc", "SV"])
def test_matches_oracle(loss_type, rng):
    b, q = 16, 40
    cos, label = make_batch(rng, b, q)
    got = float(
        add_margin(
            cos, label, loss_type=loss_type, margin=0.5, scale=32.0, hard_neg=3
        )
    )
    want = oracle_loss(cos, label, loss_type, 0.5, 32.0, 3)
    assert got == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("loss_type", ["AM", "Arc", "SV"])
def test_all_positive_rows(loss_type, rng):
    cos, label = make_batch(rng, 8, 20, frac_outlier=0.0)
    got = float(add_margin(cos, label, loss_type=loss_type, margin=0.4, scale=16.0, hard_neg=5))
    want = oracle_loss(cos, label, loss_type, 0.4, 16.0, 5)
    assert got == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("loss_type", ["AM", "Arc", "SV"])
def test_all_outlier_rows(loss_type, rng):
    cos, label = make_batch(rng, 8, 20, frac_outlier=1.1)
    assert np.all(label == -1)
    got = float(add_margin(cos, label, loss_type=loss_type, margin=0.5, scale=32.0, hard_neg=3))
    want = oracle_loss(cos, label, loss_type, 0.5, 32.0, 3)
    assert got == pytest.approx(want, rel=1e-4)
    # pure hard-negative loss: mean of clipped top-3
    assert got >= 0.0


def test_hand_computed_am():
    """Tiny fully hand-checkable AM case."""
    cos = np.array([[0.9, 0.1, -0.2]], dtype=np.float32)
    label = np.array([0], dtype=np.int32)
    m, s = 0.3, 2.0
    # target: 0.9-0.3=0.6 -> logits [1.2, 0.2, -0.4]
    logits = np.array([1.2, 0.2, -0.4])
    want = -logits[0] + np.log(np.exp(logits).sum())
    got = float(add_margin(cos, label, loss_type="AM", margin=m, scale=s, hard_neg=3))
    assert got == pytest.approx(float(want), rel=1e-3)


def test_hand_computed_outlier():
    cos = np.array([[0.5, -0.9, 0.2, 0.1]], dtype=np.float32)
    label = np.array([-1], dtype=np.int32)
    # top-2 = [0.5, 0.2]; clipped mean = 0.35
    got = float(add_margin(cos, label, loss_type="AM", margin=0.5, scale=32.0, hard_neg=2))
    assert got == pytest.approx(0.35, rel=1e-4)


def test_arc_margin_pushes_loss_up(rng):
    """Margin must strictly increase loss vs no margin for positives."""
    cos, label = make_batch(rng, 8, 30, frac_outlier=0.0)
    with_m = float(add_margin(cos, label, loss_type="Arc", margin=0.5, scale=32.0, hard_neg=3))
    no_m = float(add_margin(cos, label, loss_type="Arc", margin=0.0, scale=32.0, hard_neg=3))
    assert with_m > no_m


def test_default_hard_neg_clamp():
    assert default_hard_neg(1000) == 3  # int(0.2) = 0 -> clamped to 3
    assert default_hard_neg(30000) == 6
    assert default_hard_neg(10**6) == 10  # clamped at 10


def test_margin_logits_leaves_outliers_untouched(rng):
    cos, label = make_batch(rng, 10, 20, frac_outlier=0.5)
    out = np.asarray(margin_logits(cos, label, loss_type="Arc", margin=0.5))
    mask = label == -1
    np.testing.assert_allclose(out[mask], cos[mask].astype(np.float32), rtol=1e-6)


def test_grad_flows_only_reasonably(rng):
    """Loss is differentiable wrt cos_theta and gradient is finite."""
    import jax
    import jax.numpy as jnp

    cos, label = make_batch(rng, 8, 16)
    g = jax.grad(
        lambda c: add_margin(c, label, loss_type="SV", margin=0.5, scale=32.0, hard_neg=3)
    )(jnp.asarray(cos))
    assert np.all(np.isfinite(np.asarray(g)))


def test_label_smooth_matches_torch(rng):
    torch = pytest.importorskip("torch")
    from vlsfr_tpu.ops.margin import cross_entropy_label_smooth

    logits = rng.standard_normal((6, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=6)
    got = float(cross_entropy_label_smooth(logits, labels, epsilon=0.1))
    # reference semantics (optim/optimizer.py:136-141): smoothed targets,
    # (-q * logp).mean(0).sum()
    lp = torch.log_softmax(torch.from_numpy(logits), dim=1)
    t = torch.zeros_like(lp).scatter_(1, torch.from_numpy(labels)[:, None], 1)
    t = 0.9 * t + 0.1 / 10
    want = float((-t * lp).mean(0).sum())
    assert got == pytest.approx(want, rel=1e-5)


def test_arc_grad_finite_at_perfect_alignment(rng):
    """gt == 1.0 exactly (converged model, bf16 rounding) must not NaN the
    Arc gradient — d/dgt sqrt(1-gt²) diverges at 1 without the clamp.
    (Latent defect in the reference's own math, ffc.py:101.)"""
    import jax
    import jax.numpy as jnp

    q, d = 8, 4
    w = rng.standard_normal((q, d)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    emb = w[2:3].copy()  # cosine with its own class == 1.0 exactly
    labels = np.array([2], dtype=np.int32)

    def loss(e):
        cos = e @ w.T
        return add_margin(cos, labels, loss_type="Arc", margin=0.5, scale=32.0, hard_neg=3)

    g = np.asarray(jax.grad(loss)(jnp.asarray(emb)))
    assert np.all(np.isfinite(g)), g

    # streaming path too
    from vlsfr_tpu.ops.margin_pallas import fused_add_margin

    def loss_s(e):
        return fused_add_margin(e, jnp.asarray(w), jnp.asarray(labels),
                                loss_type="Arc", margin=0.5, scale=32.0,
                                hard_neg=3, normalize_w=False, tile=4, use_pallas=False)

    gs = np.asarray(jax.grad(loss_s)(jnp.asarray(emb)))
    assert np.all(np.isfinite(gs)), gs
