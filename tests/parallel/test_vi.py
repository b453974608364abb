"""Sharded VI / importance sampling tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nflows_tpu.flows import SimpleRealNVP
from nflows_tpu.parallel import make_mesh
from nflows_tpu.parallel.vi import (
    effective_sample_size,
    elbo_loss,
    importance_weighted_bound,
    make_sharded_vi_step,
    sharded_importance_weights,
)
from nflows_tpu.training import create_train_state


def _target_log_prob(x):
    # correlated 2-D gaussian target
    mean = jnp.asarray([1.0, -1.0])
    diff = x - mean
    return -0.5 * jnp.sum(diff ** 2 / 0.5, axis=-1) - jnp.log(2 * jnp.pi * 0.5)


def _flow(seed=0):
    return SimpleRealNVP(features=2, hidden_features=16, num_layers=3,
                         num_blocks_per_layer=1, key=jax.random.key(seed))


def test_vi_trains_toward_target():
    mesh = make_mesh(data=8, model=1)
    flow = _flow()
    opt = optax.adam(2e-3)
    state = create_train_state(flow, opt)
    step = make_sharded_vi_step(opt, mesh, _target_log_prob,
                                num_samples_per_device=64, donate=False)
    key = jax.random.key(0)
    elbos = []
    for i in range(150):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
        elbos.append(float(m["elbo"]))
    assert np.mean(elbos[-10:]) > np.mean(elbos[:10])
    # samples should have moved toward the target mean
    samples = state.flow.sample(jax.random.key(9), 512)
    mean = np.asarray(samples).mean(0)
    np.testing.assert_allclose(mean, [1.0, -1.0], atol=0.5)


def test_sharded_importance_weights_normalized():
    mesh = make_mesh(data=8, model=1)
    flow = _flow(1)
    f = sharded_importance_weights(flow, _target_log_prob, mesh,
                                   num_samples_per_device=32)
    samples, weights, log_z = f(flow, jax.random.key(0))
    assert samples.shape == (8 * 32, 2)
    assert weights.shape == (8 * 32,)
    np.testing.assert_allclose(float(weights.sum()), 1.0, atol=1e-5)
    ess = float(effective_sample_size(weights))
    assert 1.0 <= ess <= 8 * 32
    assert np.isfinite(float(log_z))


def test_single_device_estimators():
    flow = _flow(2)
    loss = elbo_loss(flow, _target_log_prob, jax.random.key(0), 128)
    assert np.isfinite(float(loss))
    bound = importance_weighted_bound(flow, _target_log_prob, jax.random.key(0), 128)
    assert np.isfinite(float(bound))
    # IWAE bound >= ELBO (in expectation; allow slack for MC noise)
    assert float(bound) >= -float(loss) - 1.0
