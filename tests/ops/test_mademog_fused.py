"""Fused MADEMoG log_prob (interpret mode) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.nn.nde.made import MixtureOfGaussiansMADE
from nflows_tpu.ops.pallas.mademog_fused import (
    can_fuse_mademog,
    fuse_mademog,
)


def _made(features=5, hidden=16, K=4, ctx=None, seed=0):
    return MixtureOfGaussiansMADE(
        features=features, hidden_features=hidden, num_blocks=2,
        num_mixture_components=K, context_features=ctx,
        key=jax.random.key(seed), rng=np.random.default_rng(seed))


def _x(n=100, d=5, seed=1, scale=1.5):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, d)) * scale,
        jnp.float32)


def test_log_prob_matches_xla():
    made = _made()
    fused = fuse_mademog(made, dtype=jnp.float32, lanes=128, interpret=True)
    x = _x()
    np.testing.assert_allclose(np.asarray(fused.log_prob(x)),
                               np.asarray(made.log_prob(x)), atol=1e-5)


def test_conditional_log_prob_matches_xla():
    made = _made(ctx=3, seed=2)
    fused = fuse_mademog(made, dtype=jnp.float32, lanes=128, interpret=True)
    x = _x(64, seed=3)
    c = jnp.asarray(np.random.default_rng(4).normal(size=(64, 3)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(fused.log_prob(x, c)),
                               np.asarray(made.log_prob(x, c)), atol=1e-5)


def test_mademog_distribution_and_sampling_delegate():
    from nflows_tpu.distributions import MADEMoG

    dist = MADEMoG(features=4, hidden_features=16, context_features=None,
                   num_blocks=2, num_mixture_components=3,
                   key=jax.random.key(5), rng=np.random.default_rng(5))
    assert can_fuse_mademog(dist)
    fused = fuse_mademog(dist, dtype=jnp.float32, lanes=128, interpret=True)
    x = _x(32, d=4, seed=6)
    np.testing.assert_allclose(np.asarray(fused.log_prob(x)),
                               np.asarray(dist.log_prob(x)), atol=1e-5)
    s_ref = dist.sample(jax.random.key(7), 16)
    s_f = fused.sample(jax.random.key(7), 16)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_f))


def test_errors_and_rejection():
    made = _made(seed=8)
    fused = fuse_mademog(made, dtype=jnp.float32, lanes=128, interpret=True)
    with pytest.raises(ValueError, match="expected"):
        fused.log_prob(jnp.ones((4, 3)))
    with pytest.raises(ValueError, match="context"):
        fused.log_prob(_x(8), jnp.ones((8, 3)))
    cmade = _made(ctx=2, seed=9)
    cf = fuse_mademog(cmade, dtype=jnp.float32, lanes=128, interpret=True)
    with pytest.raises(ValueError, match="context"):
        cf.log_prob(_x(8))
    with pytest.raises(ValueError, match="rows"):
        cf.log_prob(_x(8), jnp.ones((4, 2)))
    assert not can_fuse_mademog(
        _made(seed=10).replace(activation=jax.nn.gelu))
