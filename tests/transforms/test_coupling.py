"""Coupling transform tests (reference: tests/transforms/coupling_test.py).

Covers: identity-half passthrough, additive logdet==0, round-trip for all
coupling families, vector [20] and image [2,4,4] shapes, constrained vs
linear-tail domains, unconditional transform on the identity half."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.nn.nets import ConvResidualNet, ResidualNet
from nflows_tpu.transforms import coupling
from nflows_tpu.utils import masks as maskutils
from tests.harness import (
    assert_forward_inverse_are_consistent,
    assert_jittable_forward,
    assert_tensor_is_good,
)

BATCH = 10
FEATURES = 20
IMG_SHAPE = (2, 4, 4)


def _resnet_factory(key=0, context_features=None):
    counter = [0]

    def create(in_features, out_features):
        counter[0] += 1
        return ResidualNet(
            in_features, out_features, hidden_features=32,
            context_features=context_features, num_blocks=2,
            key=jax.random.key(key + counter[0]),
        )

    return create


def _convnet_factory(key=0, context_channels=None):
    def create(in_channels, out_channels):
        return ConvResidualNet(
            in_channels, out_channels, hidden_channels=16,
            context_channels=context_channels, num_blocks=2,
            key=jax.random.key(key),
        )

    return create


AFFINE_LIKE = [
    coupling.AffineCouplingTransform,
    coupling.AdditiveCouplingTransform,
]
SPLINE_CONSTRAINED = [
    coupling.PiecewiseLinearCouplingTransform,
    coupling.PiecewiseQuadraticCouplingTransform,
    coupling.PiecewiseCubicCouplingTransform,
    coupling.PiecewiseRationalQuadraticCouplingTransform,
]


@pytest.mark.parametrize("cls", AFFINE_LIKE)
def test_affine_vector(cls):
    mask = maskutils.create_alternating_binary_mask(FEATURES)
    t = cls(mask, _resnet_factory())
    x = jax.random.normal(jax.random.key(0), (BATCH, FEATURES))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    assert_tensor_is_good(lad, (BATCH,))
    # identity half passes through
    idx = np.where(np.asarray(mask) <= 0)[0]
    np.testing.assert_array_equal(np.asarray(y[:, idx]), np.asarray(x[:, idx]))
    if cls is coupling.AdditiveCouplingTransform:
        np.testing.assert_array_equal(np.asarray(lad), 0.0)
    assert_forward_inverse_are_consistent(t, x, eps=1e-4)
    assert_jittable_forward(t, x)


@pytest.mark.parametrize("cls", AFFINE_LIKE)
def test_affine_image(cls):
    C = IMG_SHAPE[0]
    mask = maskutils.create_mid_split_binary_mask(C)
    t = cls(mask, _convnet_factory())
    x = jax.random.normal(jax.random.key(0), (BATCH, *IMG_SHAPE))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, *IMG_SHAPE))
    assert_tensor_is_good(lad, (BATCH,))
    assert_forward_inverse_are_consistent(t, x, eps=1e-4)


@pytest.mark.parametrize("cls", SPLINE_CONSTRAINED)
def test_spline_constrained_vector(cls):
    mask = maskutils.create_alternating_binary_mask(FEATURES)
    t = cls(mask, _resnet_factory(), num_bins=8)
    x = jax.random.uniform(jax.random.key(0), (BATCH, FEATURES))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    assert_tensor_is_good(lad, (BATCH,))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)


@pytest.mark.parametrize(
    "cls",
    [
        coupling.PiecewiseLinearCouplingTransform,
        coupling.PiecewiseQuadraticCouplingTransform,
        coupling.PiecewiseRationalQuadraticCouplingTransform,
    ],
)
def test_spline_linear_tails_vector(cls):
    mask = maskutils.create_random_binary_mask(FEATURES, rng=np.random.default_rng(5))
    t = cls(mask, _resnet_factory(), num_bins=8, tails="linear", tail_bound=3.0)
    x = 2 * jax.random.normal(jax.random.key(0), (BATCH, FEATURES))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)


@pytest.mark.parametrize("cls", SPLINE_CONSTRAINED)
def test_spline_image(cls):
    C = IMG_SHAPE[0]
    mask = maskutils.create_mid_split_binary_mask(C)
    t = cls(mask, _convnet_factory(), num_bins=5)
    x = jax.random.uniform(jax.random.key(0), (BATCH, *IMG_SHAPE))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, *IMG_SHAPE))
    assert_tensor_is_good(lad, (BATCH,))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)


def test_conditional_coupling():
    mask = maskutils.create_alternating_binary_mask(FEATURES)
    t = coupling.AffineCouplingTransform(mask, _resnet_factory(context_features=4))
    x = jax.random.normal(jax.random.key(0), (BATCH, FEATURES))
    c = jax.random.normal(jax.random.key(1), (BATCH, 4))
    y, lad = t.forward(x, c)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    y_inv, lad_inv = t.inverse(y, c)
    np.testing.assert_allclose(np.asarray(y_inv), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-4)


def test_unconditional_transform_on_identity_half():
    mask = maskutils.create_alternating_binary_mask(FEATURES)
    t = coupling.PiecewiseRationalQuadraticCouplingTransform(
        mask, _resnet_factory(), num_bins=4, tails="linear",
        apply_unconditional_transform=True,
    )
    x = jax.random.normal(jax.random.key(0), (BATCH, FEATURES))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, FEATURES))
    # identity half no longer passes through unchanged
    idx = np.where(np.asarray(mask) <= 0)[0]
    assert not np.allclose(np.asarray(y[:, idx]), np.asarray(x[:, idx]))
    assert_forward_inverse_are_consistent(t, x, eps=1e-3)
