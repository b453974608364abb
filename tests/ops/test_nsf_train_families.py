"""Fused TRAINING for every coupling family (round 3): with rq/lrs pinned
in test_nsf_train.py, this file covers linear/quadratic/cubic splines and
affine/additive couplings — the full seven-family serving matrix now
trains fused too. Interpret-mode loss/gradient equality vs the autodiff'd
XLA chain (itself reference-parity-tested), plus the to_flow roundtrip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.core.module import combine, partition
from nflows_tpu.distributions import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.nn import nets
from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer
from nflows_tpu.transforms import (
    AdditiveCouplingTransform,
    AffineCouplingTransform,
    PiecewiseCubicCouplingTransform,
    PiecewiseLinearCouplingTransform,
    PiecewiseQuadraticCouplingTransform,
)
from nflows_tpu.transforms.base import CompositeTransform
from nflows_tpu.transforms.permutations import RandomPermutation

D = 6

COUPLINGS = {
    "linear": (PiecewiseLinearCouplingTransform, dict(num_bins=4)),
    "quadratic": (PiecewiseQuadraticCouplingTransform, dict(num_bins=4)),
    "cubic": (PiecewiseCubicCouplingTransform, dict(num_bins=4)),
    "affine": (AffineCouplingTransform, {}),
    "additive": (AdditiveCouplingTransform, {}),
}


def _flow(family, layers=2, seed=0):
    cls, extra = COUPLINGS[family]
    if extra:
        extra = dict(extra, tails="linear", tail_bound=3.0)
    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.key(seed), layers)
    mask = np.ones(D, dtype=np.float32)
    mask[::2] = -1
    chain = []
    for i in range(layers):
        def create(inf, outf, _k=keys[i]):
            return nets.ResidualNet(inf, outf, hidden_features=16,
                                    num_blocks=1, key=_k)
        chain.append(RandomPermutation(D, rng=rng))
        chain.append(cls(mask=mask, transform_net_create_fn=create, **extra))
        mask = mask * -1
    return Flow(transform=CompositeTransform(chain),
                distribution=StandardNormal([D]))


def _batch(seed=1, n=128, scale=1.5):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, D)) * scale,
        dtype=jnp.float32)


@pytest.mark.parametrize("family", sorted(COUPLINGS))
def test_fused_training_matches_xla(family):
    from nflows_tpu.ops.pallas.nsf_fused import _extract

    flow = _flow(family)
    tr = FusedNSFTrainer(flow, batch_size=128, interpret=True)
    x = _batch()

    fused = float(tr.loss_fn(tr.weights, x.T))
    xla = float(-flow.log_prob(x).mean())
    assert abs(fused - xla) < 1e-4, (family, fused, xla)

    g_fused = jax.grad(tr.loss_fn)(tr.weights, x.T)

    def xla_loss(params, rest):
        return -combine(params, rest).log_prob(x).mean()

    params, rest = partition(flow)
    g_params = jax.grad(xla_loss)(params, rest)
    grad_flow = combine(g_params, rest)
    _, g_kernel_layout, _, _, _ = _extract(grad_flow, jnp.float32,
                                           fold_wh_scale=False)
    for k in ("w0", "b0", "wb", "bb", "wf", "bf"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel_layout[k]),
            atol=2e-4, err_msg=f"{family}:{k}")


@pytest.mark.parametrize("family", sorted(COUPLINGS))
def test_to_flow_roundtrip(family):
    flow = _flow(family, seed=3)
    tr = FusedNSFTrainer(flow, batch_size=128, interpret=True)
    rebuilt = tr.to_flow()
    x = _batch(4)
    np.testing.assert_allclose(np.asarray(rebuilt.log_prob(x)),
                               np.asarray(flow.log_prob(x)), atol=1e-5,
                               err_msg=family)


def test_quadratic_adam_trajectory_matches():
    """Quadratic rescales ALL its params by 1/sqrt(hidden) (the clamped
    2KT slice must cover them); two fused Adam steps coincide with the
    XLA trajectory, which would drift immediately if the rescale prefix
    were wrong."""
    from nflows_tpu.training import create_train_state, make_train_step

    flow = _flow("quadratic", seed=5)
    tr = FusedNSFTrainer(flow, batch_size=128, interpret=True)
    opt = optax.adam(1e-2)
    step = tr.make_train_step(opt, donate=False)
    weights, opt_state = tr.weights, tr.init_opt(opt)
    losses_fused = []
    for i in range(2):
        weights, opt_state, loss = step(weights, opt_state, _batch(40 + i))
        losses_fused.append(float(loss))

    state = create_train_state(flow, opt)
    xla_step = make_train_step(opt, donate=False)
    losses_xla = []
    for i in range(2):
        state, metrics = xla_step(state, _batch(40 + i))
        losses_xla.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses_fused, losses_xla, atol=2e-4)


def test_affine_conditional_fused_training():
    """Context support composes with the affine family too."""
    rng = np.random.default_rng(6)
    keys = jax.random.split(jax.random.key(6), 2)
    mask = np.ones(D, dtype=np.float32)
    mask[::2] = -1
    chain = []
    for i in range(2):
        def create(inf, outf, _k=keys[i]):
            return nets.ResidualNet(inf, outf, hidden_features=16,
                                    num_blocks=1, context_features=3,
                                    key=_k)
        chain.append(RandomPermutation(D, rng=rng))
        chain.append(AffineCouplingTransform(
            mask=mask, transform_net_create_fn=create))
        mask = mask * -1
    flow = Flow(transform=CompositeTransform(chain),
                distribution=StandardNormal([D]))
    tr = FusedNSFTrainer(flow, batch_size=128, interpret=True)
    x = _batch(7)
    c = jnp.asarray(np.random.default_rng(8).normal(size=(128, 3)),
                    jnp.float32)
    fused = float(tr.loss_fn(tr.weights, x.T, c.T))
    xla = float(-flow.log_prob(x, c).mean())
    assert abs(fused - xla) < 1e-4, (fused, xla)
    g, gc = jax.grad(tr.loss_fn, argnums=(0, 2))(tr.weights, x.T, c.T)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in g.values())
    assert bool(jnp.all(jnp.isfinite(gc)))


def test_context_mismatch_raises_not_silently_drops():
    """A conditional trainer must refuse a missing context (the kernel
    would otherwise swap the context weights for zero dummies and return
    a finite but wrong NLL), and an unconditional one must refuse a
    surprise context."""
    rng = np.random.default_rng(9)
    keys = jax.random.split(jax.random.key(9), 2)
    mask = np.ones(D, dtype=np.float32)
    mask[::2] = -1

    def build(context_features):
        chain = []
        m = mask
        for i in range(2):
            def create(inf, outf, _k=keys[i]):
                return nets.ResidualNet(inf, outf, hidden_features=16,
                                        num_blocks=1,
                                        context_features=context_features,
                                        key=_k)
            chain.append(RandomPermutation(D, rng=rng))
            chain.append(AffineCouplingTransform(
                mask=m, transform_net_create_fn=create))
            m = m * -1
        return Flow(transform=CompositeTransform(chain),
                    distribution=StandardNormal([D]))

    x = _batch(11)
    c = jnp.asarray(np.random.default_rng(10).normal(size=(128, 3)),
                    jnp.float32)

    cond = FusedNSFTrainer(build(3), batch_size=128, interpret=True)
    with pytest.raises(ValueError, match="conditional"):
        cond.loss_fn(cond.weights, x.T)

    uncond = FusedNSFTrainer(build(None), batch_size=128, interpret=True)
    with pytest.raises(ValueError, match="unconditional"):
        uncond.loss_fn(uncond.weights, x.T, c.T)
