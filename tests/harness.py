"""Shared assertion harness, mirroring the reference's ``TransformTest``
(reference: tests/transforms/transform_test.py:7-31) in pytest style."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.transforms.base import CompositeTransform, InverseTransform


def assert_tensor_is_good(tensor, shape=None):
    assert isinstance(tensor, (jnp.ndarray, jax.Array))
    assert not bool(jnp.any(jnp.isnan(tensor)))
    assert not bool(jnp.any(jnp.isinf(tensor)))
    if shape is not None:
        assert tuple(tensor.shape) == tuple(shape)


def assert_close(a, b, eps=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=eps, rtol=0)


def assert_forward_inverse_are_consistent(transform, inputs, context=None, eps=1e-5):
    """inverse(forward(x)) == x with zero total logabsdet
    (reference transform_test.py:17-25)."""
    composite = CompositeTransform([transform, InverseTransform(transform)])
    identity, logabsdet = composite.forward(inputs, context)
    assert_tensor_is_good(identity, shape=inputs.shape)
    assert_tensor_is_good(logabsdet, shape=inputs.shape[:1])
    assert_close(identity, inputs, eps=eps)
    assert_close(logabsdet, jnp.zeros(inputs.shape[:1]), eps=eps)


def assert_jittable_forward(transform, inputs, context=None):
    """The transform must run under jit and match its eager output."""
    eager_out, eager_lad = transform.forward(inputs, context)
    jit_out, jit_lad = jax.jit(
        lambda t, x, c: t.forward(x, c)
    )(transform, inputs, context)
    assert_close(jit_out, eager_out, eps=1e-5)
    assert_close(jit_lad, eager_lad, eps=1e-5)
