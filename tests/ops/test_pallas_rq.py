"""Pallas RQ-spline kernel vs the XLA reference implementation.

On CPU the kernel runs in interpret mode — numerics only; the perf path is
exercised on real TPU by bench_pallas.py / the driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.ops import splines
from nflows_tpu.ops.pallas.rq_spline import rq_spline_pallas

B, D, K = 64, 6, 8


def _params(seed=0):
    keys = jax.random.split(jax.random.key(seed), 4)
    x = 2.5 * jax.random.normal(keys[0], (B, D))  # includes tails
    w = jax.random.normal(keys[1], (B, D, K))
    h = jax.random.normal(keys[2], (B, D, K))
    d = jax.random.normal(keys[3], (B, D, K - 1))
    return x, w, h, d


@pytest.mark.parametrize("inverse", [False, True])
def test_matches_reference(inverse):
    x, w, h, d = _params()
    ref_out, ref_lad = splines.unconstrained_rational_quadratic_spline(
        x, w, h, d, inverse=inverse, tails="linear", tail_bound=3.0
    )
    pl_out, pl_lad = rq_spline_pallas(
        x, w, h, d, inverse=inverse, tail_bound=3.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(pl_out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pl_lad), np.asarray(ref_lad), atol=2e-4)


def test_roundtrip():
    x, w, h, d = _params(1)
    y, lad = rq_spline_pallas(x, w, h, d, tail_bound=3.0, interpret=True)
    x_rec, lad_inv = rq_spline_pallas(y, w, h, d, inverse=True, tail_bound=3.0,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-4)


def test_gradients_match_reference():
    x, w, h, d = _params(2)

    def loss_pallas(args):
        y, lad = rq_spline_pallas(*args, tail_bound=3.0, interpret=True)
        return jnp.sum(y ** 2) + jnp.sum(lad)

    def loss_ref(args):
        y, lad = splines.unconstrained_rational_quadratic_spline(
            *args, tails="linear", tail_bound=3.0
        )
        return jnp.sum(y ** 2) + jnp.sum(lad)

    g_pl = jax.grad(loss_pallas)((x, w, h, d))
    g_ref = jax.grad(loss_ref)((x, w, h, d))
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_non_tile_aligned_batch():
    # padding path: N = 10*6 = 60, far from 1024 alignment
    keys = jax.random.split(jax.random.key(3), 4)
    x = jax.random.normal(keys[0], (10, 6))
    w = jax.random.normal(keys[1], (10, 6, K))
    h = jax.random.normal(keys[2], (10, 6, K))
    d = jax.random.normal(keys[3], (10, 6, K - 1))
    ref = splines.unconstrained_rational_quadratic_spline(
        x, w, h, d, tails="linear", tail_bound=1.0
    )
    out = rq_spline_pallas(x, w, h, d, tail_bound=1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=2e-4)
