"""Nonlinearity + learned-CDF transform tests
(reference: tests/transforms/nonlinearities_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.transforms import nonlinearities as nl
from tests.harness import (
    assert_forward_inverse_are_consistent,
    assert_tensor_is_good,
)

BATCH, DIM = 10, 5


@pytest.mark.parametrize("transform,domain", [
    (nl.Exp(), (-2, 2)),
    (nl.Tanh(), (-2, 2)),
    (nl.LogTanh(), (-3, 3)),
    (nl.LeakyReLU(), (-2, 2)),
    (nl.Sigmoid(), (-2, 2)),
    (nl.Logit(), (0.05, 0.95)),
    (nl.CauchyCDF(), (-2, 2)),
    (nl.CauchyCDFInverse(), (0.05, 0.95)),
], ids=lambda v: type(v).__name__ if not isinstance(v, tuple) else "")
def test_elementwise_roundtrip(transform, domain):
    lo, hi = domain
    x = jax.random.uniform(jax.random.key(0), (BATCH, DIM), minval=lo, maxval=hi)
    y, lad = transform.forward(x)
    assert_tensor_is_good(y, (BATCH, DIM))
    assert_tensor_is_good(lad, (BATCH,))
    assert_forward_inverse_are_consistent(transform, x, eps=1e-3)


def test_logtanh_tails():
    t = nl.LogTanh(cut_point=1.0)
    x = jnp.asarray([[5.0, -5.0, 0.5, -0.5]])
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (1, 4))
    # middle values equal tanh
    np.testing.assert_allclose(float(y[0, 2]), float(jnp.tanh(0.5)), atol=1e-6)
    x_rec, _ = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_sigmoid_temperature_learnable():
    t = nl.Sigmoid(temperature=2.0, learn_temperature=True)
    assert t.num_parameters() == 1
    t2 = nl.Sigmoid(temperature=2.0, learn_temperature=False)
    x = jax.random.normal(jax.random.key(0), (BATCH, DIM))

    def loss(mod):
        y, lad = mod.forward(x)
        return jnp.sum(y) + jnp.sum(lad)

    from nflows_tpu.core.module import partition, combine
    params, rest = partition(t)
    g = jax.grad(lambda p: loss(combine(p, rest)))(params)
    assert float(jnp.abs(g.temperature).sum()) > 0
    # non-learnable: temperature is not a trainable leaf AT ALL (a zeroed
    # grad would still let optax weight decay shrink it)
    assert t2.num_parameters() == 0
    params2, rest2 = partition(t2)
    assert params2.temperature is None
    # and the transform still computes with the fixed value
    y1, _ = t.forward(x)
    y2, _ = t2.forward(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_gated_linear_unit():
    t = nl.GatedLinearUnit()
    x = jax.random.normal(jax.random.key(0), (BATCH, 1))
    c = jax.random.normal(jax.random.key(1), (BATCH, 1))
    y, lad = t.forward(x, c)
    assert y.shape == (BATCH, 1) and lad.shape == (BATCH,)
    x_rec, lad_inv = t.inverse(y, c)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-5)


def test_composite_cdf_transform():
    t = nl.CompositeCDFTransform(nl.Sigmoid(), nl.PiecewiseLinearCDF(
        shape=[DIM], num_bins=6, key=jax.random.key(0)))
    x = jax.random.normal(jax.random.key(1), (BATCH, DIM))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, DIM))
    x_rec, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)


CDFS = [
    lambda: nl.PiecewiseLinearCDF(shape=[DIM], num_bins=6, key=jax.random.key(0)),
    lambda: nl.PiecewiseQuadraticCDF(shape=[DIM], num_bins=6, key=jax.random.key(0)),
    lambda: nl.PiecewiseCubicCDF(shape=[DIM], num_bins=6, key=jax.random.key(0)),
    lambda: nl.PiecewiseRationalQuadraticCDF(shape=[DIM], num_bins=6, key=jax.random.key(0)),
]


@pytest.mark.parametrize("make", CDFS)
def test_piecewise_cdf_constrained(make):
    t = make()
    x = jax.random.uniform(jax.random.key(1), (BATCH, DIM))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, DIM))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)


TAIL_CDFS = [
    lambda: nl.PiecewiseLinearCDF(shape=[DIM], num_bins=6, tails="linear",
                                  tail_bound=2.0, key=jax.random.key(0)),
    lambda: nl.PiecewiseQuadraticCDF(shape=[DIM], num_bins=6, tails="linear",
                                     tail_bound=2.0, key=jax.random.key(0)),
    lambda: nl.PiecewiseCubicCDF(shape=[DIM], num_bins=6, tails="linear",
                                 tail_bound=2.0, key=jax.random.key(0)),
    lambda: nl.PiecewiseRationalQuadraticCDF(shape=[DIM], num_bins=6, tails="linear",
                                             tail_bound=2.0, key=jax.random.key(0)),
]


@pytest.mark.parametrize("make", TAIL_CDFS)
def test_piecewise_cdf_tails(make):
    t = make()
    x = 1.5 * jax.random.normal(jax.random.key(1), (BATCH, DIM))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, DIM))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)


def test_rq_cdf_identity_init():
    t = nl.PiecewiseRationalQuadraticCDF(
        shape=[DIM], num_bins=6, tails="linear", tail_bound=2.0,
        identity_init=True, key=jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (BATCH, DIM), minval=-1.5, maxval=1.5)
    y, lad = t.forward(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad), 0.0, atol=1e-4)
