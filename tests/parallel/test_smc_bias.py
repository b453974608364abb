"""Quantify the within-shard-resampling approximation of the sharded SMC.

parallel/smc.py resamples particles within each device's shard (the
standard distributed-particle-filter localization — no all-to-all particle
exchange over ICI), with each shard's chains inheriting the shard's weight
mass. The log_z estimator is designed to stay unbiased under this scheme;
this test MEASURES that claim on a target with a KNOWN normalizer, sweeping
shard count (1 = global-resampling oracle) and weight imbalance (a proposal-
target mismatch strong enough to trigger resampling at many temperatures).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.distributions import StandardNormal
from nflows_tpu.flows import Flow
from nflows_tpu.parallel import make_mesh
from nflows_tpu.parallel.smc import make_sharded_smc
from nflows_tpu.transforms import IdentityTransform

D = 2
MU, SIGMA = 1.5, 0.7
# unnormalized target: exp(-||x-mu||^2 / (2 sigma^2)); true log Z:
TRUE_LOG_Z = D * (np.log(SIGMA) + 0.5 * np.log(2 * np.pi))
N_TOTAL = 512
SEEDS = range(5)


def _target_log_prob(x):
    return -0.5 * jnp.sum((x - MU) ** 2, axis=-1) / SIGMA ** 2


def _run_mean_log_z(num_shards):
    mesh = make_mesh(data=num_shards, model=1,
                     devices=jax.devices()[:num_shards])
    flow = Flow(IdentityTransform(), StandardNormal([D]))
    run = make_sharded_smc(
        _target_log_prob, mesh,
        num_chains_per_device=N_TOTAL // num_shards,
        num_temps=16, mcmc_steps=2, step_size=0.5,
        # high threshold -> resampling fires at most temperatures, so the
        # within-shard approximation is exercised hard
        ess_threshold=0.9,
    )
    vals = [float(run(flow, jax.random.key(s))["log_z"]) for s in SEEDS]
    return np.mean(vals), np.std(vals) / np.sqrt(len(vals))


@pytest.mark.slow
def test_sharded_resampling_log_z_unbiased_across_shard_counts():
    results = {k: _run_mean_log_z(k) for k in (1, 4, 8)}
    oracle_mean, oracle_sem = results[1]

    # the global-resampling oracle itself must estimate the known log Z
    assert abs(oracle_mean - TRUE_LOG_Z) < 0.08, (oracle_mean, TRUE_LOG_Z)

    for k in (4, 8):
        mean_k, sem_k = results[k]
        # sharded estimate agrees with the true value ...
        assert abs(mean_k - TRUE_LOG_Z) < 0.08, (k, mean_k, TRUE_LOG_Z)
        # ... and with the oracle within combined Monte-Carlo error
        tol = 4 * np.hypot(sem_k, oracle_sem) + 0.02
        assert abs(mean_k - oracle_mean) < tol, (k, mean_k, oracle_mean, tol)


@pytest.mark.slow
def test_sharded_resampling_under_extreme_imbalance():
    """Deliberately imbalanced shards: a sharper, further target makes the
    per-shard weight mass very unequal after the first temperatures."""
    mesh = make_mesh(data=8, model=1)
    flow = Flow(IdentityTransform(), StandardNormal([D]))

    mu, sigma = 2.5, 0.5
    true_log_z = D * (np.log(sigma) + 0.5 * np.log(2 * np.pi))

    def target(x):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=-1) / sigma ** 2

    run = make_sharded_smc(target, mesh, num_chains_per_device=128,
                           num_temps=24, mcmc_steps=3, step_size=0.5,
                           ess_threshold=0.9)
    vals = [float(run(flow, jax.random.key(100 + s))["log_z"])
            for s in range(5)]
    assert abs(np.mean(vals) - true_log_z) < 0.12, (np.mean(vals), true_log_z)
