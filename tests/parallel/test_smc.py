"""Sharded SMC/AIS with flow proposals: the log-normalizer estimate must
match the analytic value for a Gaussian target, and posterior moments must
match the target within MC error (north-star: posterior moments parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.distributions import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.parallel import make_mesh, make_sharded_smc
from nflows_tpu.transforms import IdentityTransform

D = 2
MU, SIGMA = 1.5, 0.7


def _target_log_prob(x):
    # unnormalized N(MU, SIGMA^2 I): true log Z = D/2 * log(2 pi sigma^2)
    return -0.5 * jnp.sum((x - MU) ** 2, axis=-1) / SIGMA ** 2


TRUE_LOG_Z = 0.5 * D * np.log(2 * np.pi * SIGMA ** 2)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=8, model=1)


def test_ais_log_normalizer_and_moments(mesh):
    flow = Flow(IdentityTransform(), StandardNormal([D]))
    run = make_sharded_smc(_target_log_prob, mesh,
                           num_chains_per_device=512, num_temps=24,
                           mcmc_steps=2, step_size=0.5)
    out = run(flow, jax.random.key(0))

    assert out["samples"].shape == (8 * 512, D)
    log_z = float(out["log_z"])
    assert abs(log_z - TRUE_LOG_Z) < 0.1, (log_z, TRUE_LOG_Z)

    # self-normalized posterior moments
    w = np.asarray(jax.nn.softmax(out["log_weights"]))
    s = np.asarray(out["samples"])
    mean = (w[:, None] * s).sum(0)
    var = (w[:, None] * (s - mean) ** 2).sum(0)
    np.testing.assert_allclose(mean, MU, atol=0.1)
    np.testing.assert_allclose(np.sqrt(var), SIGMA, atol=0.1)

    assert float(out["ess"]) > 100.0
    assert 0.05 < float(out["acceptance"]) < 1.0


def test_smc_matches_single_device(mesh):
    """The sharded estimate equals a 1-device mesh run up to chain RNG."""
    flow = Flow(IdentityTransform(), StandardNormal([D]))
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    run8 = make_sharded_smc(_target_log_prob, mesh,
                            num_chains_per_device=256, num_temps=16)
    run1 = make_sharded_smc(_target_log_prob, mesh1,
                            num_chains_per_device=2048, num_temps=16)
    z8 = float(run8(flow, jax.random.key(1))["log_z"])
    z1 = float(run1(flow, jax.random.key(2))["log_z"])
    assert abs(z8 - z1) < 0.15, (z8, z1)
    assert abs(z8 - TRUE_LOG_Z) < 0.15


def test_bimodal_target_unbiased_after_resampling(mesh):
    """Mode weights survive per-shard resampling (the fix keeps each shard's
    weight mass instead of flattening to global uniform — a flattening bug
    would underweight the heavy mode)."""
    VAR = 0.25

    def tlp(x):  # unnormalized 0.7*N(-2, VAR) + 0.3*N(+2, VAR), 1-D
        a = jnp.log(0.7) - 0.5 * (x[..., 0] + 2.0) ** 2 / VAR
        b = jnp.log(0.3) - 0.5 * (x[..., 0] - 2.0) ** 2 / VAR
        return jnp.logaddexp(a, b)

    true_log_z = 0.5 * np.log(2 * np.pi * VAR)   # (0.7+0.3) * sqrt(2 pi VAR)
    true_mean = 0.7 * (-2.0) + 0.3 * 2.0

    flow = Flow(IdentityTransform(), StandardNormal([1]))
    run = make_sharded_smc(tlp, mesh, num_chains_per_device=1024,
                           num_temps=32, mcmc_steps=3, step_size=0.4,
                           ess_threshold=0.7)  # force frequent resampling
    out = run(flow, jax.random.key(3))
    assert abs(float(out["log_z"]) - true_log_z) < 0.1
    w = np.asarray(jax.nn.softmax(out["log_weights"]))
    mean = float((w * np.asarray(out["samples"])[:, 0]).sum())
    assert abs(mean - true_mean) < 0.25, mean
