"""Flow-level integration: BatchNorm-between-layers train/eval lifecycle,
precomputed linear caches inside flows, set_training propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.core.module import set_training
from nflows_tpu.flows import SimpleRealNVP
from nflows_tpu.training import create_train_state, make_train_step
from nflows_tpu.transforms.base import InverseNotAvailable
from nflows_tpu.utils.datasets import make_moons


def test_realnvp_batchnorm_lifecycle():
    """Train with BN (batch stats) -> absorb running stats -> eval mode
    -> sampling works and log_probs stay close to train mode."""
    rng = np.random.default_rng(0)
    X, _ = make_moons(1024, noise=0.1, rng=rng)
    X = (X - X.mean(0)) / X.std(0)
    data = jnp.asarray(X)

    flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1,
                         batch_norm_between_layers=True,
                         key=jax.random.key(0))
    opt = optax.adam(2e-3)
    state = create_train_state(flow, opt)
    step = make_train_step(opt, donate=False)
    for i in range(100):
        state, m = step(state, data[:256])

    trained = state.flow

    # training mode: sampling must fail (BN inverse undefined)
    with pytest.raises(InverseNotAvailable):
        trained.sample(jax.random.key(1), 4)

    # absorb running statistics, flip to eval
    new_transform, _ = trained.transform.initialize_with_data(data[:512])
    eval_flow = set_training(trained.replace(transform=new_transform), False)

    samples = eval_flow.sample(jax.random.key(1), 256)
    assert samples.shape == (256, 2)
    assert not bool(jnp.any(jnp.isnan(samples)))

    # eval log_prob close to train log_prob on the stats batch
    lp_train = trained.log_prob(data[:256])
    lp_eval = eval_flow.log_prob(data[:256])
    np.testing.assert_allclose(np.asarray(lp_eval), np.asarray(lp_train),
                               atol=1.5)

    # sample_and_log_prob consistency in eval mode
    s, lp = eval_flow.sample_and_log_prob(jax.random.key(2), 64)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(eval_flow.log_prob(s)),
                               atol=1e-3)


def test_precomputed_linear_in_flow():
    """LULinear.precompute inside a flow speeds repeated sampling without
    changing results."""
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows import Flow
    from nflows_tpu.transforms import CompositeTransform, LULinear
    from nflows_tpu.transforms.autoregressive import (
        MaskedAffineAutoregressiveTransform,
    )

    lu = LULinear(4, identity_init=False, key=jax.random.key(0))
    maf = MaskedAffineAutoregressiveTransform(4, 16, key=jax.random.key(1))
    flow = Flow(CompositeTransform([lu, maf]), StandardNormal([4]))

    flow_cached = flow.replace(transform=flow.transform.replace(
        transforms=(lu.precompute(), maf)))

    x = jax.random.normal(jax.random.key(2), (16, 4))
    np.testing.assert_allclose(np.asarray(flow.log_prob(x)),
                               np.asarray(flow_cached.log_prob(x)), atol=1e-4)
    s1 = flow.sample(jax.random.key(3), 8)
    s2 = flow_cached.sample(jax.random.key(3), 8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)
