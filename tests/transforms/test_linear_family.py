"""Linear transform family tests (reference: tests/transforms/{linear,lu,qr,svd,orthogonal,conv}_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.transforms.conv import OneByOneConvolution
from nflows_tpu.transforms.linear import NaiveLinear
from nflows_tpu.transforms.lu import LULinear
from nflows_tpu.transforms.orthogonal import HouseholderSequence
from nflows_tpu.transforms.qr import QRLinear
from nflows_tpu.transforms.reshape import SqueezeTransform
from nflows_tpu.transforms.svd import SVDLinear
from tests.harness import assert_forward_inverse_are_consistent, assert_tensor_is_good

BATCH, DIM = 10, 5


def _linears():
    return [
        NaiveLinear(DIM, key=jax.random.key(0)),
        LULinear(DIM, identity_init=False, key=jax.random.key(1)),
        QRLinear(DIM, num_householder=4, key=jax.random.key(2)),
        SVDLinear(DIM, num_householder=4, identity_init=False, key=jax.random.key(3)),
    ]


@pytest.mark.parametrize("t", _linears(), ids=lambda t: type(t).__name__)
def test_forward_inverse_consistent(t):
    x = jax.random.normal(jax.random.key(10), (BATCH, DIM))
    assert_forward_inverse_are_consistent(t, x, eps=1e-4)


@pytest.mark.parametrize("t", _linears(), ids=lambda t: type(t).__name__)
def test_weight_matches_forward(t):
    """forward == x @ W.T + b and logabsdet == slogdet(W)."""
    x = jax.random.normal(jax.random.key(11), (BATCH, DIM))
    y, lad = t.forward(x)
    W = np.asarray(t.weight())
    expected = np.asarray(x) @ W.T + np.asarray(t.bias)
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-4)
    _, ref_lad = np.linalg.slogdet(W)
    np.testing.assert_allclose(np.asarray(lad), ref_lad * np.ones(BATCH), atol=1e-4)


@pytest.mark.parametrize("t", _linears(), ids=lambda t: type(t).__name__)
def test_weight_inverse(t):
    W = np.asarray(t.weight())
    Winv = np.asarray(t.weight_inverse())
    np.testing.assert_allclose(W @ Winv, np.eye(DIM), atol=1e-4)


@pytest.mark.parametrize("t", _linears(), ids=lambda t: type(t).__name__)
def test_precompute_cache_matches(t):
    """precompute() (the eval-cache analogue) must not change outputs."""
    x = jax.random.normal(jax.random.key(12), (BATCH, DIM))
    y_ref, lad_ref = t.forward(x)
    xi_ref, ladi_ref = t.inverse(x)
    tc = t.precompute()
    y_c, lad_c = tc.forward(x)
    xi_c, ladi_c = tc.inverse(x)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad_c), np.asarray(lad_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(xi_c), np.asarray(xi_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ladi_c), np.asarray(ladi_ref), atol=1e-4)
    # invalidation restores no-cache path
    t2 = tc.invalidate_cache()
    assert t2.cache_weight is None and not t2.using_cache


@pytest.mark.parametrize("num_transforms", [1, 2, 3, 4, 5])
def test_householder_orthogonal(num_transforms):
    t = HouseholderSequence(DIM, num_transforms)
    x = jax.random.normal(jax.random.key(0), (BATCH, DIM))
    y, lad = t.forward(x)
    # norm preserved, logdet 0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=1),
        np.linalg.norm(np.asarray(x), axis=1), atol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(lad), 0.0)
    assert_forward_inverse_are_consistent(t, x, eps=1e-4)
    # matrix() is orthogonal; paired eye-tiled init gives the identity for
    # even K (odd K leaves one unpaired reflection)
    M = np.asarray(t.matrix())
    np.testing.assert_allclose(M @ M.T, np.eye(DIM), atol=1e-5)
    if num_transforms % 2 == 0:
        np.testing.assert_allclose(M, np.eye(DIM), atol=1e-5)


def test_lu_identity_init():
    t = LULinear(DIM, identity_init=True)
    x = jax.random.normal(jax.random.key(0), (BATCH, DIM))
    y, lad = t.forward(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad), 0.0, atol=1e-4)


def test_one_by_one_convolution():
    C, H, W = 4, 3, 3
    t = OneByOneConvolution(C, identity_init=False, key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    x = jax.random.normal(jax.random.key(1), (BATCH, C, H, W))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, C, H, W))
    assert_tensor_is_good(lad, (BATCH,))
    x_rec, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-4)


class TestSqueeze:
    def test_forward(self):
        x = jax.random.normal(jax.random.key(0), (BATCH, 3, 4, 4))
        t = SqueezeTransform(factor=2)
        y, lad = t.forward(x)
        assert y.shape == (BATCH, 12, 2, 2)
        np.testing.assert_array_equal(np.asarray(lad), 0.0)
        assert t.get_output_shape(3, 4, 4) == (12, 2, 2)

    def test_forward_values(self):
        """Space-to-depth block layout (reference reshape_test.py pattern)."""
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 4, 4)
        y, _ = SqueezeTransform(2).forward(x)
        # each output channel holds one position of each 2x2 block
        np.testing.assert_array_equal(
            np.asarray(y[0, 0]), np.asarray([[0, 2], [8, 10]])
        )
        np.testing.assert_array_equal(
            np.asarray(y[0, 1]), np.asarray([[1, 3], [9, 11]])
        )

    def test_roundtrip(self):
        x = jax.random.normal(jax.random.key(0), (BATCH, 4, 6, 6))
        t = SqueezeTransform(factor=2)
        assert_forward_inverse_are_consistent(t, x)

    def test_bad_factor(self):
        with pytest.raises(ValueError):
            SqueezeTransform(factor=1)
