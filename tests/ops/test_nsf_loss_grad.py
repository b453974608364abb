"""One-kernel fused loss+grad (nsf_loss_grad_call): loss, gradients, and
the Adam trajectory must equal the split custom_vjp path exactly — the
one-kernel path is a pure FLOP/launch optimization (3 forward-equivalents
instead of 5), not a different computation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer


def _flow(features=6, hidden=32, layers=3, bins=4, seed=0, **kw):
    return NeuralSplineFlow(
        features=features, hidden_features=hidden, num_layers=layers,
        num_blocks_per_layer=2, num_bins=bins, tail_bound=3.0,
        key=jax.random.key(seed), rng=np.random.default_rng(seed), **kw)


def _batch(seed=1, n=128, d=6, scale=1.5):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, d)) * scale,
        dtype=jnp.float32)


def _ctx(seed=3, n=128, c=2):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, c)), dtype=jnp.float32)


@pytest.fixture(scope="module")
def trainer():
    return FusedNSFTrainer(_flow(), batch_size=128, interpret=True)


def _assert_tree_close(a, b, atol):
    ja, jb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(ja) == len(jb)
    for x, y in zip(ja, jb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_one_kernel_matches_custom_vjp(trainer):
    x = _batch(2)
    vag = trainer._value_and_grad()
    loss1, g1 = vag(trainer.weights, x.T)
    loss2, g2 = jax.value_and_grad(trainer.loss_fn)(trainer.weights, x.T)
    assert abs(float(loss1) - float(loss2)) < 1e-5
    _assert_tree_close(g1, g2, atol=1e-5)


def test_one_kernel_is_selected_by_train_steps(trainer):
    # the NSF trainer provides the one-kernel path; the base must pick it
    assert trainer._build_loss_grad(trainer._lanes) is not None


def test_adam_trajectory_matches_split_path():
    flow = _flow(seed=5)
    tr = FusedNSFTrainer(flow, batch_size=128, interpret=True)
    opt = optax.adam(1e-3)
    step = tr.make_train_step(opt, donate=False)

    # reference: explicit value_and_grad over the custom_vjp loss
    w, s = tr.weights, tr.init_opt(opt)

    def ref_step(weights, opt_state, batch):
        loss, grads = jax.value_and_grad(tr.loss_fn)(weights, batch.T)
        updates, opt_state = opt.update(grads, opt_state, weights)
        return optax.apply_updates(weights, updates), opt_state, loss

    w2, s2 = tr.weights, tr.init_opt(opt)
    for i in range(3):
        x = _batch(10 + i)
        w, s, loss_fused = step(w, s, x)
        w2, s2, loss_ref = ref_step(w2, s2, x)
        assert abs(float(loss_fused) - float(loss_ref)) < 1e-5
    _assert_tree_close(w, w2, atol=1e-5)


def test_conditional_one_kernel_matches(trainer):
    flow = _flow(seed=7, context_features=2)
    tr = FusedNSFTrainer(flow, batch_size=128, interpret=True)
    x, c = _batch(8), _ctx(9)
    vag = tr._value_and_grad()
    loss1, g1 = vag(tr.weights, x.T, c.T)
    loss2, g2 = jax.value_and_grad(tr.loss_fn)(tr.weights, x.T, c.T)
    assert abs(float(loss1) - float(loss2)) < 1e-5
    _assert_tree_close(g1, g2, atol=1e-5)
    # context weight grads are present and nonzero
    assert float(jnp.max(jnp.abs(g1["wc0"]))) > 0


def test_one_kernel_families():
    """Every coupling family runs the one-kernel path with grads matching
    the split path (the per-family softmax-rescale prefixes differ)."""
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.nn import nets
    from nflows_tpu.transforms import (
        AdditiveCouplingTransform,
        AffineCouplingTransform,
        PiecewiseCubicCouplingTransform,
        PiecewiseLinearCouplingTransform,
        PiecewiseLinearRationalCouplingTransform,
        PiecewiseQuadraticCouplingTransform,
    )
    from nflows_tpu.transforms.base import CompositeTransform
    from nflows_tpu.transforms.permutations import RandomPermutation

    couplings = {
        "linear": (PiecewiseLinearCouplingTransform, dict(num_bins=4)),
        "quadratic": (PiecewiseQuadraticCouplingTransform,
                      dict(num_bins=4)),
        "cubic": (PiecewiseCubicCouplingTransform, dict(num_bins=4)),
        "affine": (AffineCouplingTransform, {}),
        "additive": (AdditiveCouplingTransform, {}),
        # lrs exercises the min_lambda spline_kw plumbing through the
        # one-kernel path (the fixtures only cover rq)
        "lrs": (PiecewiseLinearRationalCouplingTransform,
                dict(num_bins=4)),
    }
    d = 6
    for family, (cls, extra) in sorted(couplings.items()):
        if extra:
            extra = dict(extra, tails="linear", tail_bound=3.0)
        rng = np.random.default_rng(11)
        keys = jax.random.split(jax.random.key(11), 2)
        mask = np.ones(d, dtype=np.float32)
        mask[::2] = -1
        chain = []
        for i in range(2):
            def create(inf, outf, _k=keys[i]):
                return nets.ResidualNet(inf, outf, hidden_features=16,
                                        num_blocks=1, key=_k)
            chain.append(RandomPermutation(d, rng=rng))
            chain.append(cls(mask=mask, transform_net_create_fn=create,
                             **extra))
            mask = mask * -1
        flow = Flow(transform=CompositeTransform(chain),
                    distribution=StandardNormal([d]))
        tr = FusedNSFTrainer(flow, batch_size=128, interpret=True)
        x = _batch(12, d=d)
        loss1, g1 = tr._value_and_grad()(tr.weights, x.T)
        loss2, g2 = jax.value_and_grad(tr.loss_fn)(tr.weights, x.T)
        assert abs(float(loss1) - float(loss2)) < 1e-5, family
        _assert_tree_close(g1, g2, atol=2e-5)


def test_multi_tile_grid_accumulates(trainer):
    """With batch > lane tile the grid accumulates weight grads across
    tiles; equality vs the split path pins the accumulation."""
    flow = _flow(seed=13)
    tr = FusedNSFTrainer(flow, batch_size=256, interpret=True)
    tr._lanes = 128  # force a 2-step grid
    tr._apply = tr._build_apply(128)
    x = _batch(14, n=256)
    loss1, g1 = tr._value_and_grad(128)(tr.weights, x.T)
    loss2, g2 = jax.value_and_grad(tr.loss_fn)(tr.weights, x.T)
    assert abs(float(loss1) - float(loss2)) < 1e-5
    _assert_tree_close(g1, g2, atol=1e-5)
