"""Pallas LRS-spline kernel vs the XLA implementation (interpret mode on
CPU; perf on real TPU via benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.ops import splines
from nflows_tpu.ops.pallas.lrs_spline import lrs_spline_pallas

B, D, K = 64, 6, 8


def _params(seed=0):
    keys = jax.random.split(jax.random.key(seed), 5)
    x = 2.5 * jax.random.normal(keys[0], (B, D))  # includes tails
    w = jax.random.normal(keys[1], (B, D, K))
    h = jax.random.normal(keys[2], (B, D, K))
    d = jax.random.normal(keys[3], (B, D, K - 1))
    l = jax.random.normal(keys[4], (B, D, K))
    return x, w, h, d, l


@pytest.mark.parametrize("inverse", [False, True])
def test_matches_reference(inverse):
    x, w, h, d, l = _params()
    ref_out, ref_lad = splines.unconstrained_linear_rational_spline(
        x, w, h, d, l, inverse=inverse, tails="linear", tail_bound=3.0)
    pl_out, pl_lad = lrs_spline_pallas(
        x, w, h, d, l, inverse=inverse, tail_bound=3.0, interpret=True)
    np.testing.assert_allclose(np.asarray(pl_out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pl_lad), np.asarray(ref_lad), atol=2e-4)


def test_roundtrip():
    x, w, h, d, l = _params(1)
    y, lad = lrs_spline_pallas(x, w, h, d, l, tail_bound=3.0, interpret=True)
    x2, lad_inv = lrs_spline_pallas(y, w, h, d, l, inverse=True,
                                    tail_bound=3.0, interpret=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)


def test_gradients_match_xla():
    x, w, h, d, l = _params(2)

    def loss_pl(w_):
        _, lad = lrs_spline_pallas(x, w_, h, d, l, tail_bound=3.0,
                                   interpret=True)
        return jnp.sum(lad)

    def loss_ref(w_):
        _, lad = splines.unconstrained_linear_rational_spline(
            x, w_, h, d, l, tails="linear", tail_bound=3.0)
        return jnp.sum(lad)

    g_pl = jax.grad(loss_pl)(w)
    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-4)
