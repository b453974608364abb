"""Sharded sequential Monte Carlo / annealed importance sampling with flow
proposals (the BASELINE.json north-star component: "flow-based variational
inference / SMC proposal ... chains sharded across the pod, importance-weight
normalization over ICI collectives").

Annealing path: gamma_j(x) = q(x)^(1-beta_j) * p*(x)^(beta_j) from the flow
proposal q to the unnormalized target p*, with betas on a linear grid. Per
temperature:

1. reweight: log w += (beta_j - beta_{j-1}) * (log p*(x) - log q(x))
   — the standard AIS incremental weight;
2. move: ``mcmc_steps`` random-walk Metropolis sweeps targeting gamma_j
   (flow log_prob is cheap on coupling flows, so MH with q-preconditioned
   proposals is one fused XLA program);
3. adaptive resampling: when the GLOBAL effective sample size (psum over
   ICI) drops below ``ess_threshold * n_total``, chains resample
   *within each device's shard* by systematic resampling and the running
   log-normalizer absorbs the current weights. Per-shard resampling avoids
   an all-to-all particle exchange over ICI; with equal shard sizes and
   i.i.d. initialization it is the standard locality approximation used by
   distributed particle filters.

Everything is one jitted ``lax.scan`` over temperatures inside ``shard_map``
— chains shard over the ``data`` axis, the only communication is one psum
(ESS) and one psum-logsumexp (normalizer) per temperature.

Returns both the particle system and ``log_Z`` — the AIS estimate of the
target's log-normalizer (exact in expectation).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from nflows_tpu.parallel.vi import _global_logsumexp

__all__ = ["make_sharded_smc"]


def _systematic_resample(key, log_w, x):
    """Systematic resampling within the local shard: [n] weights, [n, D]
    particles -> resampled particles, uniform weights."""
    n = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    positions = (jax.random.uniform(key) + jnp.arange(n)) / n
    cum = jnp.cumsum(w)
    idx = jnp.searchsorted(cum, positions)
    idx = jnp.clip(idx, 0, n - 1)
    return x[idx]


def make_sharded_smc(
    target_log_prob: Callable,
    mesh: Mesh,
    num_chains_per_device: int,
    num_temps: int = 16,
    mcmc_steps: int = 2,
    step_size: float = 0.3,
    ess_threshold: float = 0.5,
):
    """Build ``run(flow, key) -> dict`` sampling the unnormalized
    ``target_log_prob`` with ``flow`` as the AIS/SMC proposal.

    Result dict: ``samples`` [n_total, D] (sharded on 'data'),
    ``log_weights`` [n_total] (final, unnormalized), ``log_z`` (global AIS
    normalizer estimate), ``ess`` (global final effective sample size),
    ``acceptance`` (mean MH acceptance rate).
    """
    betas = jnp.linspace(0.0, 1.0, num_temps + 1)

    def local(flow, key):
        idx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, idx)
        k_init, k_scan = jax.random.split(key)

        x, log_q0 = flow.sample_and_log_prob(k_init, num_chains_per_device)
        n = num_chains_per_device
        n_total = n * jax.lax.axis_size("data")

        def log_gamma(x, beta):
            return (1.0 - beta) * flow.log_prob(x) + beta * target_log_prob(x)

        def temp_step(carry, inp):
            x, log_w, log_z, acc_sum = carry
            beta_prev, beta, k = inp

            # 1. incremental AIS weight
            log_w = log_w + (beta - beta_prev) * (
                target_log_prob(x) - flow.log_prob(x)
            )

            # 2. MH moves targeting gamma_beta
            def mh(carry, k_step):
                x, acc = carry
                k_prop, k_u = jax.random.split(k_step)
                prop = x + step_size * jax.random.normal(k_prop, x.shape)
                log_ratio = log_gamma(prop, beta) - log_gamma(x, beta)
                accept = jnp.log(jax.random.uniform(k_u, (x.shape[0],))) < log_ratio
                x = jnp.where(accept[:, None], prop, x)
                return (x, acc + jnp.mean(accept)), None

            ks = jax.random.split(jax.random.fold_in(k, 1), mcmc_steps)
            (x, acc_sum), _ = jax.lax.scan(mh, (x, acc_sum), ks)

            # 3. adaptive per-shard resampling on global ESS
            log_norm = _global_logsumexp(log_w, "data")
            ess = jnp.exp(2.0 * log_norm - _global_logsumexp(2.0 * log_w, "data"))

            def do_resample(args):
                x, log_w, log_z = args
                new_x = _systematic_resample(jax.random.fold_in(k, 2), log_w, x)
                # absorb the weights into the running normalizer
                new_log_z = log_z + log_norm - jnp.log(
                    jnp.asarray(n_total, log_w.dtype))
                return new_x, jnp.zeros_like(log_w), new_log_z

            x, log_w, log_z = jax.lax.cond(
                ess < ess_threshold * n_total,
                do_resample, lambda a: a, (x, log_w, log_z))
            return (x, log_w, log_z, acc_sum), None

        keys = jax.random.split(k_scan, num_temps)
        init = (x, jnp.zeros(n, x.dtype), jnp.zeros((), x.dtype),
                jnp.zeros((), x.dtype))
        (x, log_w, log_z, acc_sum), _ = jax.lax.scan(
            temp_step, init, (betas[:-1], betas[1:], keys))

        log_norm = _global_logsumexp(log_w, "data")
        log_z = log_z + log_norm - jnp.log(jnp.asarray(n_total, log_w.dtype))
        ess = jnp.exp(2.0 * log_norm - _global_logsumexp(2.0 * log_w, "data"))
        acceptance = acc_sum / float(num_temps * mcmc_steps)
        return x, log_w, log_z, ess, acceptance

    sharded = shard_map(
        local, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P("data"), P("data"), P(), P(), P()),
        check_vma=False,
    )

    def run(flow, key):
        samples, log_w, log_z, ess, acceptance = jax.jit(sharded)(flow, key)
        return {"samples": samples, "log_weights": log_w, "log_z": log_z,
                "ess": ess, "acceptance": acceptance}

    return run
