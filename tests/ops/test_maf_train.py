"""Fused AR training (forward+backward megakernels, interpret mode):
gradients and the Adam trajectory must equal the autodiff'd XLA chain on
the model's own parameters, with masked MADE entries never moving."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.core.module import combine, partition
from nflows_tpu.flows import MaskedAutoregressiveFlow
from nflows_tpu.ops.pallas.maf_train import FusedMAFTrainer


def _flow(features=5, hidden=16, layers=2, seed=0, **kw):
    return MaskedAutoregressiveFlow(
        features=features, hidden_features=hidden, num_layers=layers,
        num_blocks_per_layer=2, use_random_permutations=True,
        key=jax.random.key(seed), rng=np.random.default_rng(seed), **kw)


def _batch(seed=1, n=128, d=5, scale=1.5):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, d)) * scale,
        dtype=jnp.float32)


@pytest.fixture(scope="module")
def flow():
    return _flow()


@pytest.fixture(scope="module")
def trainer(flow):
    return FusedMAFTrainer(flow, batch_size=128, interpret=True)


def test_fused_loss_matches_xla(flow, trainer):
    x = _batch()
    fused = float(trainer.loss_fn(trainer.weights, x.T))
    xla = float(-flow.log_prob(x).mean())
    assert abs(fused - xla) < 1e-4, (fused, xla)


def test_fused_gradients_match_xla_chain(flow, trainer):
    """Gradients in kernel layout must equal the XLA chain's (via the
    purely-permuting unfolded extraction of the XLA grad pytree); masked
    entries must have exactly zero gradient."""
    from nflows_tpu.ops.pallas.maf_fused import _extract

    x = _batch(2)
    g_fused = jax.grad(trainer.loss_fn)(trainer.weights, x.T)

    def xla_loss(params, rest):
        return -combine(params, rest).log_prob(x).mean()

    params, rest = partition(flow)
    g_params = jax.grad(xla_loss)(params, rest)
    grad_flow = combine(g_params, rest)
    _, g_kernel, _, _, _, _, _, _ = _extract(
        grad_flow, jnp.float32, fold_masks=False, fold_wh_scale=False,
        allow_wrapped=False, return_masks=True)

    for k in ("wi", "bi", "wb", "bb", "wf", "bf"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel[k]),
            atol=2e-4, err_msg=k)
    # masked entries: gradient exactly zero (the mask fold kills them)
    for k in ("wi", "wb", "wf"):
        dead = np.asarray(trainer._masks[k]) == 0.0
        assert np.all(np.asarray(g_fused[k])[dead] == 0.0), k


def test_fused_adam_step_matches(flow, trainer):
    """Three Adam steps on the unfolded kernel-layout weights coincide
    with three Adam steps on the model's own parameters, and masked
    entries never move."""
    from nflows_tpu.ops.pallas.maf_fused import _extract
    from nflows_tpu.training import create_train_state, make_train_step

    opt = optax.adam(1e-2)
    step = trainer.make_train_step(opt, donate=False)
    weights, opt_state = trainer.weights, trainer.init_opt(opt)
    losses_fused = []
    for i in range(3):
        weights, opt_state, loss = step(weights, opt_state, _batch(10 + i))
        losses_fused.append(float(loss))

    state = create_train_state(flow, opt)
    xla_step = make_train_step(opt, donate=False)
    losses_xla = []
    for i in range(3):
        state, metrics = xla_step(state, _batch(10 + i))
        losses_xla.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses_fused, losses_xla, atol=2e-4)

    trained_xla = combine(state.params, state.rest)
    _, w_xla, _, _, _, _, _, _ = _extract(
        trained_xla, jnp.float32, fold_masks=False, fold_wh_scale=False,
        allow_wrapped=False, return_masks=True)
    for k in ("wi", "wb", "wf", "bf"):
        np.testing.assert_allclose(np.asarray(weights[k]),
                                   np.asarray(w_xla[k]), atol=5e-4,
                                   err_msg=k)
    # masked entries identical to their initial values
    for k in ("wi", "wb", "wf"):
        dead = np.asarray(trainer._masks[k]) == 0.0
        np.testing.assert_array_equal(
            np.asarray(weights[k])[dead],
            np.asarray(trainer.weights[k])[dead], err_msg=k)


def test_to_flow_roundtrip(flow, trainer):
    rebuilt = trainer.to_flow()
    x = _batch(4)
    np.testing.assert_allclose(np.asarray(rebuilt.log_prob(x)),
                               np.asarray(flow.log_prob(x)), atol=1e-5)


def test_nsf_ar_fused_training():
    """RQ transformer: the in-kernel wh_scale (unfolded weights) must
    reproduce the XLA chain's loss and gradients."""
    from nflows_tpu.models import NeuralSplineFlowAR
    from nflows_tpu.ops.pallas.maf_fused import _extract

    flow = NeuralSplineFlowAR(features=5, hidden_features=16, num_layers=2,
                              num_blocks_per_layer=2, num_bins=4,
                              tail_bound=3.0, key=jax.random.key(0),
                              rng=np.random.default_rng(0))
    tr = FusedMAFTrainer(flow, batch_size=128, interpret=True)
    x = _batch(5)
    fused = float(tr.loss_fn(tr.weights, x.T))
    xla = float(-flow.log_prob(x).mean())
    assert abs(fused - xla) < 1e-4, (fused, xla)

    g_fused = jax.grad(tr.loss_fn)(tr.weights, x.T)

    def xla_loss(params, rest):
        return -combine(params, rest).log_prob(x).mean()

    params, rest = partition(flow)
    g_params = jax.grad(xla_loss)(params, rest)
    _, g_kernel, _, _, _, _, _, _ = _extract(
        combine(g_params, rest), jnp.float32, fold_masks=False,
        fold_wh_scale=False, allow_wrapped=False, return_masks=True)
    for k in ("wi", "wb", "wf", "bf"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel[k]),
            atol=2e-4, err_msg=k)


def test_conditional_maf_fused_training():
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.transforms import (
        CompositeTransform,
        MaskedAffineAutoregressiveTransform,
        RandomPermutation,
    )

    rng = np.random.default_rng(3)
    keys = jax.random.split(jax.random.key(3), 2)
    chain = []
    for i in range(2):
        chain.append(RandomPermutation(5, rng=rng))
        chain.append(MaskedAffineAutoregressiveTransform(
            features=5, hidden_features=16, context_features=3,
            num_blocks=2, key=keys[i]))
    flow = Flow(transform=CompositeTransform(chain),
                distribution=StandardNormal([5]))
    tr = FusedMAFTrainer(flow, batch_size=128, interpret=True)
    x = _batch(7)
    c = jnp.asarray(np.random.default_rng(8).normal(size=(128, 3)),
                    jnp.float32)

    fused = float(tr.loss_fn(tr.weights, x.T, c.T))
    xla = float(-flow.log_prob(x, c).mean())
    assert abs(fused - xla) < 1e-4, (fused, xla)

    g_fused, g_ctx_t = jax.grad(tr.loss_fn, argnums=(0, 2))(
        tr.weights, x.T, c.T)

    def xla_loss(params, rest, ctx):
        return -combine(params, rest).log_prob(x, ctx).mean()

    params, rest = partition(flow)
    g_params, g_ctx_xla = jax.grad(xla_loss, argnums=(0, 2))(
        params, rest, c)
    from nflows_tpu.ops.pallas.maf_fused import _extract
    _, g_kernel, _, _, _, _, _, _ = _extract(
        combine(g_params, rest), jnp.float32, fold_masks=False,
        fold_wh_scale=False, allow_wrapped=False, return_masks=True)
    for k in ("wi", "bi", "wb", "bb", "wf", "bf",
              "wci", "bci", "wcb", "bcb"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel[k]),
            atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(g_ctx_t.T),
                               np.asarray(g_ctx_xla), atol=2e-4)

    # to_flow writes the context projections back too
    rebuilt = tr.to_flow()
    np.testing.assert_allclose(np.asarray(rebuilt.log_prob(x, c)),
                               np.asarray(flow.log_prob(x, c)), atol=1e-5)


def test_iaf_rejected():
    from nflows_tpu.models import InverseAutoregressiveFlow

    iaf = InverseAutoregressiveFlow(features=5, hidden_features=16,
                                    num_layers=2, num_blocks_per_layer=2,
                                    key=jax.random.key(0))
    with pytest.raises(ValueError, match="fixed point"):
        FusedMAFTrainer(iaf, batch_size=128, interpret=True)
