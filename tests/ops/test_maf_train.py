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


# -- IAF: fused VI training in the sampling direction ----------------------


def _iaf(features=4, hidden=16, layers=2, seed=0):
    from nflows_tpu.models import InverseAutoregressiveFlow

    return InverseAutoregressiveFlow(
        features=features, hidden_features=hidden, num_layers=layers,
        num_blocks_per_layer=2, key=jax.random.key(seed))


def test_iaf_sample_and_log_prob_matches_xla():
    """The fused sampling direction (single MADE pass per wrapped layer,
    inverse-permutation placement) must match transform.inverse and the
    Flow sign convention log q = log N(z) - logabsdet."""
    import math

    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer

    flow = _iaf()
    tr = FusedIAFTrainer(flow, batch_size=128, interpret=True)
    z = _batch(11, d=4, scale=1.0)

    x_ref, lad_ref = flow.transform.inverse(z)
    lq_ref = (-0.5 * jnp.sum(z * z, axis=1)
              - 0.5 * 4 * math.log(2 * math.pi) - lad_ref)

    x_f, lq_f = tr.sample_and_log_prob_fn(tr.weights, z.T)
    np.testing.assert_allclose(np.asarray(x_f.T), np.asarray(x_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lq_f), np.asarray(lq_ref),
                               atol=1e-4)


def test_iaf_vi_gradients_match_xla_chain():
    """Reverse-KL gradients through the fused sampling kernel (including
    the target's gradient entering via the sample cotangent) must equal
    jax.grad through the XLA chain."""
    import math

    from nflows_tpu.ops.pallas.maf_fused import _extract
    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer

    flow = _iaf(seed=1)
    tr = FusedIAFTrainer(flow, batch_size=128, interpret=True)
    z = _batch(12, d=4, scale=1.0)
    mu = jnp.asarray([1.0, -0.5, 0.25, 2.0])

    def target_log_prob(x):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1)

    def fused_loss(weights):
        x_t, lq = tr.sample_and_log_prob_fn(weights, z.T)
        return jnp.mean(lq - target_log_prob(x_t.T))

    g_fused = jax.grad(fused_loss)(tr.weights)

    def xla_loss(params, rest):
        f = combine(params, rest)
        x, lad = f.transform.inverse(z)
        lq = (-0.5 * jnp.sum(z * z, axis=1)
              - 0.5 * 4 * math.log(2 * math.pi) - lad)
        return jnp.mean(lq - target_log_prob(x))

    params, rest = partition(flow)
    g_params = jax.grad(xla_loss)(params, rest)
    _, g_kernel, _, _, _, _, _, _ = _extract(
        combine(g_params, rest), jnp.float32, fold_masks=False,
        fold_wh_scale=False, allow_wrapped=True, return_masks=True)
    for k in ("wi", "bi", "wb", "bb", "wf", "bf"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel[k]),
            atol=2e-4, err_msg=k)


def test_iaf_vi_training_fits_shifted_gaussian():
    """A few fused VI steps must reduce the negative ELBO against a
    shifted-Gaussian target and move the sample mean toward it."""
    import optax

    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer

    flow = _iaf(features=3, hidden=8, layers=2, seed=2)
    tr = FusedIAFTrainer(flow, batch_size=128, interpret=True)
    mu = jnp.asarray([1.5, -1.0, 0.5])

    def target_log_prob(x):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1)

    opt = optax.adam(5e-2)
    step = tr.make_vi_train_step(opt, target_log_prob, donate=False)
    w, s = tr.weights, tr.init_opt(opt)
    losses = []
    for i in range(15):
        w, s, loss = step(w, s, jax.random.key(100 + i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses

    z = jnp.asarray(np.random.default_rng(5).normal(size=(256, 3)),
                    jnp.float32)
    x_t, _ = tr.sample_and_log_prob_fn(w, z.T)
    mean = np.asarray(x_t.T.mean(axis=0))
    assert np.all(np.abs(mean - np.asarray(mu)) < 0.6), mean

    # export keeps the sampling behavior
    rebuilt = tr.to_flow(w)
    x_ref, _ = rebuilt.transform.inverse(z)
    np.testing.assert_allclose(np.asarray(x_t.T), np.asarray(x_ref),
                               atol=1e-5)


def test_iaf_trainer_rejects_plain_maf(flow):
    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer

    with pytest.raises(ValueError, match="all-wrapped"):
        FusedIAFTrainer(flow, batch_size=128, interpret=True)


def test_iaf_trainer_log_prob_direction_unavailable():
    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer

    tr = FusedIAFTrainer(_iaf(), batch_size=128, interpret=True)
    with pytest.raises(NotImplementedError, match="SAMPLING"):
        tr.loss_fn(tr.weights, jnp.zeros((4, 128)))


def test_iaf_trainer_dp_step_unavailable():
    """Regression (review finding): the inherited DP step must NOT
    silently train the density-direction NLL on an IAF — every inherited
    step builder routes through _loss_from_apply, which raises."""
    from jax.sharding import Mesh

    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer

    tr = FusedIAFTrainer(_iaf(), batch_size=1024, interpret=True)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with pytest.raises(NotImplementedError, match="SAMPLING"):
        tr.make_dp_train_step(optax.adam(1e-3), mesh)
