"""Fused MADEMoG training (forward+backward megakernels, interpret mode):
gradients and the Adam trajectory must equal the autodiff'd XLA path on
the model's own parameters, with masked MADE entries never moving."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.core.module import combine, partition
from nflows_tpu.nn.nde.made import MixtureOfGaussiansMADE
from nflows_tpu.ops.pallas.mademog_fused import _extract
from nflows_tpu.ops.pallas.mademog_train import FusedMADEMoGTrainer


def _made(features=5, hidden=16, K=4, ctx=None, seed=0):
    return MixtureOfGaussiansMADE(
        features=features, hidden_features=hidden, num_blocks=2,
        num_mixture_components=K, context_features=ctx,
        key=jax.random.key(seed), rng=np.random.default_rng(seed))


def _batch(seed=1, n=128, d=5, scale=1.5):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, d)) * scale,
        dtype=jnp.float32)


@pytest.fixture(scope="module")
def made():
    return _made()


@pytest.fixture(scope="module")
def trainer(made):
    return FusedMADEMoGTrainer(made, batch_size=128, interpret=True)


def test_fused_loss_matches_xla(made, trainer):
    x = _batch()
    fused = float(trainer.loss_fn(trainer.weights, x.T))
    xla = float(-made.log_prob(x).mean())
    assert abs(fused - xla) < 1e-4, (fused, xla)


def test_fused_gradients_match_xla(made, trainer):
    """Gradients in kernel layout must equal the XLA path's (via the
    purely-permuting unfolded extraction of the XLA grad pytree); masked
    entries must have exactly zero gradient."""
    x = _batch(2)
    g_fused = jax.grad(trainer.loss_fn)(trainer.weights, x.T)

    def xla_loss(params, rest):
        return -combine(params, rest).log_prob(x).mean()

    params, rest = partition(made)
    g_params = jax.grad(xla_loss)(params, rest)
    g_kernel, _, _, _ = _extract(combine(g_params, rest), jnp.float32,
                                 fold_masks=False, return_masks=True)
    for k in ("wi", "bi", "wb", "bb", "wf", "bf"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel[k]),
            atol=2e-4, err_msg=k)
    for k in ("wi", "wb", "wf"):
        masked = np.asarray(g_fused[k]) * (1 - np.asarray(trainer._masks[k]))
        assert np.all(masked == 0.0), k


def test_adam_trajectory_matches_and_masked_entries_frozen(made, trainer):
    opt = optax.adam(1e-2)
    step = trainer.make_train_step(opt, donate=False)
    weights, opt_state = trainer.weights, trainer.init_opt(opt)
    losses_fused = []
    for i in range(2):
        weights, opt_state, loss = step(weights, opt_state, _batch(40 + i))
        losses_fused.append(float(loss))
    # masked entries never move under Adam (zero grad -> zero update)
    for k in ("wi", "wb", "wf"):
        off = 1 - np.asarray(trainer._masks[k])
        np.testing.assert_array_equal(
            np.asarray(weights[k]) * off,
            np.asarray(trainer.weights[k]) * off, err_msg=k)

    params, rest = partition(made)
    o2 = opt.init(params)
    losses_xla = []
    for i in range(2):
        x = _batch(40 + i)

        def loss_fn(p):
            return -combine(p, rest).log_prob(x).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, o2 = opt.update(grads, o2, params)
        params = optax.apply_updates(params, upd)
        losses_xla.append(float(loss))
    np.testing.assert_allclose(losses_fused, losses_xla, atol=2e-4)

    # export: the trained kernel weights written back into the model give
    # the XLA-trained model's density
    rebuilt = trainer.to_dist(weights)
    trained_xla = combine(params, rest)
    xe = _batch(99)
    np.testing.assert_allclose(np.asarray(rebuilt.log_prob(xe)),
                               np.asarray(trained_xla.log_prob(xe)),
                               atol=1e-4)


def test_conditional_gradients_match_xla():
    made = _made(ctx=3, seed=2)
    tr = FusedMADEMoGTrainer(made, batch_size=128, interpret=True)
    x = _batch(3)
    c = jnp.asarray(np.random.default_rng(4).normal(size=(128, 3)),
                    jnp.float32)
    fused = float(tr.loss_fn(tr.weights, x.T, c.T))
    xla = float(-made.log_prob(x, c).mean())
    assert abs(fused - xla) < 1e-4, (fused, xla)

    g_fused, gc_fused = jax.grad(tr.loss_fn, argnums=(0, 2))(
        tr.weights, x.T, c.T)

    def xla_loss(params, rest, ctx):
        return -combine(params, rest).log_prob(x, ctx).mean()

    params, rest = partition(made)
    g_params, gc = jax.grad(xla_loss, argnums=(0, 2))(params, rest, c)
    g_kernel, _, _, _ = _extract(combine(g_params, rest), jnp.float32,
                                 fold_masks=False, return_masks=True)
    for k in ("wi", "bi", "wb", "bb", "wf", "bf",
              "wci", "bci", "wcb", "bcb"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel[k]),
            atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(gc_fused), np.asarray(gc.T),
                               atol=2e-4)


def test_context_guard_and_auto_select(made):
    from nflows_tpu.training import fused_trainer

    tr = fused_trainer(made, batch_size=128, interpret=True)
    assert isinstance(tr, FusedMADEMoGTrainer)
    with pytest.raises(ValueError, match="unconditional"):
        tr.loss_fn(tr.weights, _batch().T, _batch(5, d=3).T)

    from nflows_tpu.distributions import MADEMoG
    dist = MADEMoG(features=4, hidden_features=16, context_features=None,
                   num_blocks=2, num_mixture_components=3,
                   key=jax.random.key(5), rng=np.random.default_rng(5))
    tr2 = FusedMADEMoGTrainer(dist, batch_size=128, interpret=True)
    x = _batch(6, d=4)
    np.testing.assert_allclose(
        float(tr2.loss_fn(tr2.weights, x.T)),
        float(-dist.log_prob(x).mean()), atol=1e-4)
    # to_dist rewraps the distribution type
    assert isinstance(tr2.to_dist(), MADEMoG)
