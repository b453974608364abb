"""Sharded sequential Monte Carlo / annealed importance sampling with flow
proposals (the BASELINE.json north-star component: "flow-based variational
inference / SMC proposal ... chains sharded across the pod, importance-weight
normalization over ICI collectives").

Annealing path: gamma_j(x) = q(x)^(1-beta_j) * p*(x)^(beta_j) from the flow
proposal q to the unnormalized target p*, with betas on a linear grid. Per
temperature:

1. reweight: log w += (beta_j - beta_{j-1}) * (log p*(x) - log q(x))
   — the standard AIS incremental weight (log p*, log q are carried through
   the scan, so no density is ever evaluated twice at the same point);
2. move: ``mcmc_steps`` isotropic random-walk Metropolis sweeps targeting
   gamma_j — one target_log_prob + one flow.log_prob evaluation per sweep;
3. adaptive resampling: when the GLOBAL effective sample size (psum over
   ICI) drops below ``ess_threshold * n_total``, chains resample *within
   each device's shard* by systematic resampling. Each shard's post-resample
   chains carry their shard's weight mass (local logsumexp / n), so
   cross-shard mass is preserved exactly and the log-normalizer estimate
   stays unbiased; only the within-shard ancestry is localized (the standard
   distributed-particle-filter approximation, which avoids an all-to-all
   particle exchange over ICI). A global constant is absorbed into the
   running ``log_z`` purely for numerical range.

Everything is one jitted ``lax.scan`` over temperatures inside ``shard_map``
— chains shard over the ``data`` axis, the only communication is one psum
(ESS) and one psum-logsumexp (normalizer) per temperature.

Returns the particle system and ``log_Z``, the AIS estimate of the target's
log-normalizer.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from nflows_tpu.parallel.vi import _global_ess, _global_logsumexp

__all__ = ["make_sharded_smc"]


def _systematic_resample(key, log_w, x):
    """Systematic resampling within the local shard: [n] weights, [n, D]
    particles -> resampled particle indices [n]."""
    n = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    positions = (jax.random.uniform(key) + jnp.arange(n)) / n
    cum = jnp.cumsum(w)
    idx = jnp.searchsorted(cum, positions)
    return jnp.clip(idx, 0, n - 1)


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
    ``acceptance`` (global mean MH acceptance rate).
    """
    betas = jnp.linspace(0.0, 1.0, num_temps + 1)

    def local(flow, key):
        idx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, idx)
        k_init, k_scan = jax.random.split(key)

        x, log_q = flow.sample_and_log_prob(k_init, num_chains_per_device)
        log_p = target_log_prob(x)
        n = num_chains_per_device
        n_total = n * jax.lax.axis_size("data")
        log_n = jnp.log(jnp.asarray(float(n)))
        log_n_total = jnp.log(jnp.asarray(float(n_total)))

        def temp_step(carry, inp):
            x, log_p, log_q, log_w, log_z, acc_sum = carry
            beta_prev, beta, k = inp

            # 1. incremental AIS weight from the carried densities
            log_w = log_w + (beta - beta_prev) * (log_p - log_q)

            # 2. random-walk MH targeting gamma_beta; carry densities so
            # each sweep costs exactly one target + one flow eval
            def mh(carry, k_step):
                x, log_p, log_q, acc = carry
                k_prop, k_u = jax.random.split(k_step)
                prop = x + step_size * jax.random.normal(k_prop, x.shape)
                lp_prop = target_log_prob(prop)
                lq_prop = flow.log_prob(prop)
                log_ratio = ((1.0 - beta) * (lq_prop - log_q)
                             + beta * (lp_prop - log_p))
                accept = (jnp.log(jax.random.uniform(k_u, (x.shape[0],)))
                          < log_ratio)
                x = jnp.where(accept[:, None], prop, x)
                log_p = jnp.where(accept, lp_prop, log_p)
                log_q = jnp.where(accept, lq_prop, log_q)
                return (x, log_p, log_q, acc + jnp.mean(accept)), None

            ks = jax.random.split(jax.random.fold_in(k, 1), mcmc_steps)
            (x, log_p, log_q, acc_sum), _ = jax.lax.scan(
                mh, (x, log_p, log_q, acc_sum), ks)

            # 3. adaptive per-shard resampling on global ESS
            log_norm = _global_logsumexp(log_w, "data")
            ess = _global_ess(log_w, "data")

            def do_resample(args):
                x, log_p, log_q, log_w, log_z = args
                sel = _systematic_resample(jax.random.fold_in(k, 2), log_w, x)
                # each shard's chains inherit the shard's mass (unbiased:
                # cross-shard weight ratios are preserved); shift by the
                # global mean weight purely for numerical range
                shift = log_norm - log_n_total
                local_lse = jax.scipy.special.logsumexp(log_w)
                new_log_w = jnp.full_like(log_w, local_lse - log_n - shift)
                return (x[sel], log_p[sel], log_q[sel], new_log_w,
                        log_z + shift)

            x, log_p, log_q, log_w, log_z = jax.lax.cond(
                ess < ess_threshold * n_total,
                do_resample, lambda a: a, (x, log_p, log_q, log_w, log_z))
            return (x, log_p, log_q, log_w, log_z, acc_sum), None

        keys = jax.random.split(k_scan, num_temps)
        init = (x, log_p, log_q, jnp.zeros(n, x.dtype),
                jnp.zeros((), x.dtype), jnp.zeros((), x.dtype))
        (x, log_p, log_q, log_w, log_z, acc_sum), _ = jax.lax.scan(
            temp_step, init, (betas[:-1], betas[1:], keys))

        log_norm = _global_logsumexp(log_w, "data")
        log_z = log_z + log_norm - log_n_total
        ess = _global_ess(log_w, "data")
        acceptance = jax.lax.pmean(acc_sum, "data") / float(
            num_temps * mcmc_steps)
        return x, log_w, log_z, ess, acceptance

    sharded = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P("data"), P("data"), P(), P(), P()),
        check_vma=False,
    ))

    def run(flow, key):
        samples, log_w, log_z, ess, acceptance = sharded(flow, key)
        return {"samples": samples, "log_weights": log_w, "log_z": log_z,
                "ess": ess, "acceptance": acceptance}

    return run
