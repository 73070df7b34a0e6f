"""Interpret-mode parity of the experimental Pallas 3×3 conv
(ops/conv_pallas.py) against lax.conv_general_dilated — the measured
negative result lives in docs/PERF.md round 3; the kernel stays correct
either way."""

import jax.numpy as jnp
import numpy as np
import pytest

from vlsfr_tpu.ops.conv_pallas import conv3x3_pallas, conv3x3_xla


@pytest.mark.parametrize("mode", ["taps9", "im2col"])
def test_conv_matches_xla(mode, rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1)
    ref = conv3x3_xla(x, w)
    y = conv3x3_pallas(x, w, mode=mode, strip=4, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_conv_bn_stats_epilogue(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1)
    ref = conv3x3_xla(x, w).astype(jnp.float32).reshape(-1, 8)
    y, (s1, s2) = conv3x3_pallas(x, w, mode="taps9", strip=4,
                                 with_stats=True, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(jnp.sum(ref, 0)),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.sum(jnp.square(ref), 0)),
                               rtol=1e-5, atol=1e-4)
