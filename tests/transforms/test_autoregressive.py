"""Autoregressive transform tests (reference: tests/transforms/autoregressive_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.transforms import autoregressive as ar
from tests.harness import (
    assert_forward_inverse_are_consistent,
    assert_jittable_forward,
    assert_tensor_is_good,
)

BATCH, FEATURES, HIDDEN = 10, 8, 32


def _make(cls, **kwargs):
    return cls(features=FEATURES, hidden_features=HIDDEN, num_blocks=2,
               key=jax.random.key(0), **kwargs)


def test_affine_forward_shapes():
    t = _make(ar.MaskedAffineAutoregressiveTransform)
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    assert_tensor_is_good(lad, (BATCH,))
    assert_jittable_forward(t, x)


def test_affine_inverse_roundtrip():
    t = _make(ar.MaskedAffineAutoregressiveTransform)
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)


def test_affine_conditional():
    t = ar.MaskedAffineAutoregressiveTransform(
        features=FEATURES, hidden_features=HIDDEN, context_features=3,
        key=jax.random.key(0),
    )
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    c = jax.random.normal(jax.random.key(2), (BATCH, 3))
    y, lad = t.forward(x, c)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    y_inv, lad_inv = t.inverse(y, c)
    np.testing.assert_allclose(np.asarray(y_inv), np.asarray(x), atol=1e-3)


def test_affine_autoregressive_property():
    """∂y_k/∂x_j == 0 for j > k; ∂y_k/∂x_k != 0."""
    t = _make(ar.MaskedAffineAutoregressiveTransform)
    x = jax.random.normal(jax.random.key(1), (1, FEATURES))
    jac = jax.jacrev(lambda z: t.forward(z)[0][0])(x)[:, 0, :]
    jac = np.asarray(jac)
    for k in range(FEATURES):
        assert np.all(jac[k, k + 1:] == 0.0)
        assert jac[k, k] != 0.0


@pytest.mark.parametrize("make", [
    lambda: _make(ar.MaskedPiecewiseLinearAutoregressiveTransform, num_bins=6),
    lambda: _make(ar.MaskedPiecewiseQuadraticAutoregressiveTransform, num_bins=6),
    lambda: _make(ar.MaskedPiecewiseCubicAutoregressiveTransform, num_bins=6),
    lambda: _make(ar.MaskedPiecewiseRationalQuadraticAutoregressiveTransform, num_bins=6),
])
def test_spline_ar_constrained_roundtrip(make):
    t = make()
    x = jax.random.uniform(jax.random.key(1), (BATCH, FEATURES))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    assert_tensor_is_good(lad, (BATCH,))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)


@pytest.mark.parametrize("make", [
    lambda: _make(ar.MaskedPiecewiseQuadraticAutoregressiveTransform,
                  num_bins=6, tails="linear", tail_bound=3.0),
    lambda: _make(ar.MaskedPiecewiseRationalQuadraticAutoregressiveTransform,
                  num_bins=6, tails="linear", tail_bound=3.0),
])
def test_spline_ar_tails_roundtrip(make):
    t = make()
    x = 2 * jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)


def test_inverse_under_jit():
    t = _make(ar.MaskedAffineAutoregressiveTransform)
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    y, _ = t.forward(x)
    inv_eager, _ = t.inverse(y)
    inv_jit, _ = jax.jit(lambda m, z: m.inverse(z))(t, y)
    np.testing.assert_allclose(np.asarray(inv_jit), np.asarray(inv_eager), atol=1e-5)
