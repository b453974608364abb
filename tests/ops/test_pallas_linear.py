"""Pallas linear-spline kernel vs the XLA reference (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.ops import splines
from nflows_tpu.ops.pallas.linear_spline import linear_spline_pallas

B, D, K = 64, 6, 8


def _params(seed=0):
    keys = jax.random.split(jax.random.key(seed), 2)
    x = 2.5 * jax.random.normal(keys[0], (B, D))
    p = jax.random.normal(keys[1], (B, D, K))
    return x, p


@pytest.mark.parametrize("inverse", [False, True])
def test_matches_reference(inverse):
    x, p = _params()
    ref_out, ref_lad = splines.unconstrained_linear_spline(
        x, p, inverse=inverse, tails="linear", tail_bound=3.0)
    pl_out, pl_lad = linear_spline_pallas(
        x, p, inverse=inverse, tail_bound=3.0, interpret=True)
    np.testing.assert_allclose(np.asarray(pl_out), np.asarray(ref_out),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pl_lad), np.asarray(ref_lad),
                               atol=2e-4)


def test_roundtrip():
    x, p = _params(1)
    y, lad = linear_spline_pallas(x, p, tail_bound=3.0, interpret=True)
    x_rec, lad_inv = linear_spline_pallas(y, p, inverse=True, tail_bound=3.0,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-4)


def test_gradients_match_reference():
    x, p = _params(2)

    def loss_pl(x, p):
        out, lad = linear_spline_pallas(x, p, tail_bound=3.0, interpret=True)
        return jnp.sum(out ** 2) + jnp.sum(lad)

    def loss_ref(x, p):
        out, lad = splines.unconstrained_linear_spline(
            x, p, tails="linear", tail_bound=3.0)
        return jnp.sum(out ** 2) + jnp.sum(lad)

    g_pl = jax.grad(loss_pl, argnums=(0, 1))(x, p)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
