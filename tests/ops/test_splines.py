"""Functional spline kernel tests (reference: tests/transforms/splines/*).

Each spline family gets: forward/inverse round-trip, logabsdet antisymmetry
(lad_fwd + lad_inv == 0), domain mapping, and jit-consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.ops import splines

BATCH, DIM, K = 17, 5, 10


def _rand(key, *shape):
    return jax.random.normal(key, shape)


def _check_roundtrip(fwd_fn, inv_fn, inputs, eps=1e-3, interval=None):
    outputs, logabsdet = fwd_fn(inputs)
    assert outputs.shape == inputs.shape
    assert not bool(jnp.any(jnp.isnan(outputs)))
    if interval is not None:
        lo, hi = interval
        assert bool(jnp.all(outputs >= lo - 1e-5)) and bool(jnp.all(outputs <= hi + 1e-5))
    inputs_rec, logabsdet_inv = inv_fn(outputs)
    np.testing.assert_allclose(np.asarray(inputs_rec), np.asarray(inputs), atol=eps)
    np.testing.assert_allclose(
        np.asarray(logabsdet + logabsdet_inv), np.zeros(inputs.shape), atol=eps
    )


class TestRationalQuadratic:
    def _params(self, seed=0, shape=(BATCH, DIM), num_derivs=K + 1):
        keys = jax.random.split(jax.random.key(seed), 3)
        return (
            _rand(keys[0], *shape, K),
            _rand(keys[1], *shape, K),
            _rand(keys[2], *shape, num_derivs),
        )

    def test_constrained_roundtrip(self):
        w, h, d = self._params()
        x = jax.random.uniform(jax.random.key(42), (BATCH, DIM))
        _check_roundtrip(
            lambda t: splines.rational_quadratic_spline(t, w, h, d, inverse=False),
            lambda t: splines.rational_quadratic_spline(t, w, h, d, inverse=True),
            x, eps=1e-3, interval=(0, 1),
        )

    def test_unconstrained_roundtrip(self):
        w, h, d = self._params(num_derivs=K - 1)
        x = 3 * jax.random.normal(jax.random.key(42), (BATCH, DIM))  # incl. tails
        _check_roundtrip(
            lambda t: splines.unconstrained_rational_quadratic_spline(t, w, h, d, inverse=False),
            lambda t: splines.unconstrained_rational_quadratic_spline(t, w, h, d, inverse=True),
            x, eps=1e-3,
        )

    def test_tails_are_identity(self):
        w, h, d = self._params(num_derivs=K - 1)
        x = jnp.full((BATCH, DIM), 5.0)
        y, lad = splines.unconstrained_rational_quadratic_spline(x, w, h, d)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))
        np.testing.assert_allclose(np.asarray(lad), 0.0)

    def test_identity_init(self):
        # enable_identity_init + zero params => identity map (constrained
        # spline, matching reference rational_quadratic_test.py:34-60)
        w = jnp.zeros((BATCH, DIM, K))
        h = jnp.zeros((BATCH, DIM, K))
        d = jnp.zeros((BATCH, DIM, K + 1))
        for inverse in (False, True):
            x = jax.random.uniform(jax.random.key(1), (BATCH, DIM))
            y, lad = splines.rational_quadratic_spline(
                x, w, h, d, inverse=inverse, enable_identity_init=True
            )
            np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
            np.testing.assert_allclose(np.asarray(lad), 0.0, atol=1e-4)

    def test_gradients_finite(self):
        w, h, d = self._params(num_derivs=K - 1)

        def loss(params, x):
            w_, h_, d_ = params
            y, lad = splines.unconstrained_rational_quadratic_spline(x, w_, h_, d_)
            return jnp.sum(y) + jnp.sum(lad)

        x = 3 * jax.random.normal(jax.random.key(7), (BATCH, DIM))
        grads = jax.grad(loss)((w, h, d), x)
        for g in grads:
            assert not bool(jnp.any(jnp.isnan(g)))

    def test_jit_matches_eager(self):
        w, h, d = self._params(num_derivs=K - 1)
        x = jax.random.normal(jax.random.key(3), (BATCH, DIM))
        eager = splines.unconstrained_rational_quadratic_spline(x, w, h, d)
        jitted = jax.jit(
            lambda *a: splines.unconstrained_rational_quadratic_spline(*a)
        )(x, w, h, d)
        np.testing.assert_allclose(np.asarray(eager[0]), np.asarray(jitted[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(eager[1]), np.asarray(jitted[1]), atol=1e-5)


class TestLinear:
    def test_constrained_roundtrip(self):
        pdf = _rand(jax.random.key(0), BATCH, DIM, K)
        x = jax.random.uniform(jax.random.key(42), (BATCH, DIM))
        _check_roundtrip(
            lambda t: splines.linear_spline(t, pdf, inverse=False),
            lambda t: splines.linear_spline(t, pdf, inverse=True),
            x, eps=1e-3, interval=(0, 1),
        )

    def test_unconstrained_roundtrip(self):
        pdf = _rand(jax.random.key(0), BATCH, DIM, K)
        x = 3 * jax.random.normal(jax.random.key(42), (BATCH, DIM))
        _check_roundtrip(
            lambda t: splines.unconstrained_linear_spline(t, pdf, inverse=False),
            lambda t: splines.unconstrained_linear_spline(t, pdf, inverse=True),
            x, eps=1e-3,
        )


class TestQuadratic:
    @pytest.mark.parametrize("num_heights", [K + 1, K - 1])
    def test_constrained_roundtrip(self, num_heights):
        w = _rand(jax.random.key(0), BATCH, DIM, K)
        h = _rand(jax.random.key(1), BATCH, DIM, num_heights)
        x = jax.random.uniform(jax.random.key(42), (BATCH, DIM))
        _check_roundtrip(
            lambda t: splines.quadratic_spline(t, w, h, inverse=False),
            lambda t: splines.quadratic_spline(t, w, h, inverse=True),
            x, eps=1e-3, interval=(0, 1),
        )

    def test_unconstrained_roundtrip(self):
        w = _rand(jax.random.key(0), BATCH, DIM, K)
        h = _rand(jax.random.key(1), BATCH, DIM, K - 1)
        x = 3 * jax.random.normal(jax.random.key(42), (BATCH, DIM))
        _check_roundtrip(
            lambda t: splines.unconstrained_quadratic_spline(t, w, h, inverse=False),
            lambda t: splines.unconstrained_quadratic_spline(t, w, h, inverse=True),
            x, eps=1e-3,
        )


class TestCubic:
    def _params(self, seed=0):
        keys = jax.random.split(jax.random.key(seed), 4)
        return (
            _rand(keys[0], BATCH, DIM, K),
            _rand(keys[1], BATCH, DIM, K),
            _rand(keys[2], BATCH, DIM, 1),
            _rand(keys[3], BATCH, DIM, 1),
        )

    def test_constrained_roundtrip(self):
        w, h, dl, dr = self._params()
        x = jax.random.uniform(jax.random.key(42), (BATCH, DIM))
        _check_roundtrip(
            lambda t: splines.cubic_spline(t, w, h, dl, dr, inverse=False),
            lambda t: splines.cubic_spline(t, w, h, dl, dr, inverse=True),
            x, eps=1e-3, interval=(0, 1),
        )

    def test_unconstrained_roundtrip(self):
        w, h, dl, dr = self._params()
        x = 3 * jax.random.normal(jax.random.key(42), (BATCH, DIM))
        _check_roundtrip(
            lambda t: splines.unconstrained_cubic_spline(t, w, h, dl, dr, inverse=False),
            lambda t: splines.unconstrained_cubic_spline(t, w, h, dl, dr, inverse=True),
            x, eps=1e-3,
        )

    def test_gradients_finite(self):
        w, h, dl, dr = self._params()

        def loss(params, x):
            y, lad = splines.unconstrained_cubic_spline(x, *params)
            return jnp.sum(y) + jnp.sum(lad)

        x = 3 * jax.random.normal(jax.random.key(7), (BATCH, DIM))
        grads = jax.grad(loss)((w, h, dl, dr), x)
        for g in grads:
            assert not bool(jnp.any(jnp.isnan(g)))


def test_cubic_inverse_total_on_adversarial_params():
    """Regression: the reference-style Blinn closed-form cubic inverse
    overflows fp32 and NaNs on ~61% of N(0,1) unnormalized params at
    scale; the bisection+Newton inverse must be total and round-trip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nflows_tpu.ops import splines

    N, K = 8192, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N,)) * 2.5, jnp.float32)
    w = jnp.asarray(rng.normal(size=(N, K)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(N, K)), jnp.float32)
    dl = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    dr = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)

    y, lad = splines.unconstrained_cubic_spline(
        x, w, h, dl, dr, tails="linear", tail_bound=3.0)
    x_rec, lad_inv = splines.unconstrained_cubic_spline(
        y, w, h, dl, dr, inverse=True, tails="linear", tail_bound=3.0)
    assert bool(jnp.all(jnp.isfinite(x_rec)))
    assert bool(jnp.all(jnp.isfinite(lad_inv)))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-3)

    # implicit-function gradients through the root solve must be finite
    # and match finite differences on a sample coordinate
    def f(wp):
        out, _ = splines.unconstrained_cubic_spline(
            x[:64], wp, h[:64], dl[:64], dr[:64], inverse=True,
            tails="linear", tail_bound=3.0)
        return jnp.sum(out)

    g = jax.grad(f)(w[:64])
    assert bool(jnp.all(jnp.isfinite(g)))
    eps = 1e-3
    w0 = np.asarray(w[:64])
    wp, wm = w0.copy(), w0.copy()
    wp[0, 0] += eps
    wm[0, 0] -= eps
    fd = (float(f(jnp.asarray(wp))) - float(f(jnp.asarray(wm)))) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0]), fd, rtol=0.05, atol=1e-3)


def test_all_spline_families_total_at_adversarial_scale():
    """Every spline family must stay finite for 3-sigma-scale unnormalized
    params at volume (the regime where the cubic closed forms NaN'd).
    Pinned so a future 'optimization' cannot reintroduce fragility."""
    import jax.numpy as jnp
    import numpy as np
    from nflows_tpu.ops import splines

    N, K = 16384, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N,)) * 2.5, jnp.float32)

    def arr(shape):
        return jnp.asarray(rng.normal(size=shape) * 3.0, jnp.float32)

    cases = {
        "linear": lambda inv: splines.unconstrained_linear_spline(
            x, arr((N, K)), inverse=inv, tails="linear", tail_bound=3.0),
        "quadratic": lambda inv: splines.unconstrained_quadratic_spline(
            x, arr((N, K)), arr((N, K - 1)), inverse=inv, tails="linear",
            tail_bound=3.0),
        "cubic": lambda inv: splines.unconstrained_cubic_spline(
            x, arr((N, K)), arr((N, K)), arr((N, 1)), arr((N, 1)),
            inverse=inv, tails="linear", tail_bound=3.0),
        "rq": lambda inv: splines.unconstrained_rational_quadratic_spline(
            x, arr((N, K)), arr((N, K)), arr((N, K - 1)), inverse=inv,
            tails="linear", tail_bound=3.0),
        "lrs": lambda inv: splines.unconstrained_linear_rational_spline(
            x, arr((N, K)), arr((N, K)), arr((N, K - 1)), arr((N, K)),
            inverse=inv, tails="linear", tail_bound=3.0),
    }
    for name, f in cases.items():
        for inv in (False, True):
            o, l = f(inv)
            assert bool(jnp.all(jnp.isfinite(o))), (name, inv)
            assert bool(jnp.all(jnp.isfinite(l))), (name, inv)
