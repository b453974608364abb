"""Linear-rational spline kernel (beyond-reference; arXiv:2001.05168):
round-trip, logdet-vs-autodiff, antisymmetry, identity tails, C1."""

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.ops.splines import (
    linear_rational_spline,
    unconstrained_linear_rational_spline,
)

B, D, K = 32, 4, 6


def _params(seed, n_deriv):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, D, K)), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(B, D, K)), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(B, D, n_deriv)), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(B, D, K)), dtype=jnp.float32),
    )


def test_constrained_roundtrip_and_antisymmetry():
    uw, uh, ud, ul = _params(0, K + 1)
    x = jnp.asarray(np.random.default_rng(1).uniform(0.02, 0.98, size=(B, D)),
                    dtype=jnp.float32)
    y, lad = linear_rational_spline(x, uw, uh, ud, ul)
    assert bool(jnp.all((y >= 0) & (y <= 1)))
    x2, lad_inv = linear_rational_spline(y, uw, uh, ud, ul, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)


def test_logabsdet_matches_autodiff():
    uw, uh, ud, ul = _params(2, K + 1)
    x = jnp.asarray(np.random.default_rng(3).uniform(0.05, 0.95, size=(B, D)),
                    dtype=jnp.float32)
    y, lad = linear_rational_spline(x, uw, uh, ud, ul)
    g = jax.vmap(jax.vmap(jax.grad(
        lambda xi, w, h, d, l: linear_rational_spline(xi, w, h, d, l)[0]
    )))(x, uw, uh, ud, ul)
    np.testing.assert_allclose(np.asarray(jnp.log(g)), np.asarray(lad),
                               atol=1e-3)


def test_tails_identity_outside():
    uw, uh, ud, ul = _params(4, K - 1)
    x = jnp.asarray(np.random.default_rng(5).normal(scale=3.0, size=(B, D)),
                    dtype=jnp.float32)
    y, lad = unconstrained_linear_rational_spline(x, uw, uh, ud, ul,
                                                  tail_bound=2.0)
    outside = np.abs(np.asarray(x)) > 2.0
    np.testing.assert_allclose(np.asarray(y)[outside],
                               np.asarray(x)[outside], atol=0)
    np.testing.assert_allclose(np.asarray(lad)[outside], 0.0, atol=0)
    x2, lad_inv = unconstrained_linear_rational_spline(
        y, uw, uh, ud, ul, inverse=True, tail_bound=2.0)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)


def test_monotone_and_continuous():
    rng = np.random.default_rng(6)
    x = jnp.asarray(np.linspace(1e-4, 1 - 1e-4, 4001), dtype=jnp.float32)
    n = len(x)
    uw = jnp.broadcast_to(jnp.asarray(rng.normal(size=(K,)), jnp.float32), (n, K))
    uh = jnp.broadcast_to(jnp.asarray(rng.normal(size=(K,)), jnp.float32), (n, K))
    ud = jnp.broadcast_to(jnp.asarray(rng.normal(size=(K + 1,)), jnp.float32), (n, K + 1))
    ul = jnp.broadcast_to(jnp.asarray(rng.normal(size=(K,)), jnp.float32), (n, K))
    y, _ = linear_rational_spline(x, uw, uh, ud, ul)
    dy = np.diff(np.asarray(y))
    assert (dy >= 0).all()
    # continuity: refining the grid 8x shrinks the max step ~8x (a C0
    # discontinuity would keep an O(1) jump at any resolution)
    x8 = jnp.asarray(np.linspace(1e-4, 1 - 1e-4, 8 * (n - 1) + 1),
                     dtype=jnp.float32)
    n8 = len(x8)
    y8, _ = linear_rational_spline(
        x8,
        jnp.broadcast_to(uw[0], (n8, K)), jnp.broadcast_to(uh[0], (n8, K)),
        jnp.broadcast_to(ud[0], (n8, K + 1)), jnp.broadcast_to(ul[0], (n8, K)))
    ratio = float(np.abs(np.diff(np.asarray(y8))).max() / np.abs(dy).max())
    # a genuine C0 discontinuity keeps ratio ~1; a continuous (even very
    # peaked) derivative shrinks it substantially under refinement
    assert ratio < 0.5, ratio
