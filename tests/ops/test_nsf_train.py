"""Fused NSF training (forward+backward megakernels, interpret mode):
gradients and the full Adam trajectory must equal the autodiff'd XLA
chain on the model's own parameters."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.core.module import combine, partition
from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer


def _flow(features=6, hidden=32, layers=3, bins=4, seed=0, **kw):
    return NeuralSplineFlow(
        features=features, hidden_features=hidden, num_layers=layers,
        num_blocks_per_layer=2, num_bins=bins, tail_bound=3.0,
        key=jax.random.key(seed), rng=np.random.default_rng(seed), **kw)


@pytest.fixture(scope="module")
def flow():
    return _flow()


@pytest.fixture(scope="module")
def trainer(flow):
    return FusedNSFTrainer(flow, batch_size=128, interpret=True)


def _batch(seed=1, n=128, d=6, scale=1.5):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, d)) * scale,
        dtype=jnp.float32)


def test_fused_loss_matches_xla(flow, trainer):
    x = _batch()
    fused = float(trainer.loss_fn(trainer.weights, x.T))
    xla = float(-flow.log_prob(x).mean())
    assert abs(fused - xla) < 1e-4, (fused, xla)


def test_fused_gradients_match_xla_chain(flow, trainer):
    """The recompute-in-kernel backward must produce the same gradients as
    jax.grad through the XLA chain, compared in kernel layout via the
    (purely permuting) extraction applied to the XLA grad pytree."""
    from nflows_tpu.ops.pallas.nsf_fused import _extract

    x = _batch(2)

    g_fused = jax.grad(trainer.loss_fn)(trainer.weights, x.T)

    def xla_loss(params, rest):
        return -combine(params, rest).log_prob(x).mean()

    params, rest = partition(flow)
    g_params = jax.grad(xla_loss)(params, rest)
    grad_flow = combine(g_params, rest)  # param grads + REAL buffers
    _, g_kernel_layout, _, _, _ = _extract(grad_flow, jnp.float32,
                                           fold_wh_scale=False)

    for k in ("w0", "b0", "wb", "bb", "wf", "bf"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel_layout[k]),
            atol=2e-4, err_msg=k)


def test_grad_accumulates_across_tiles(flow):
    """Weight grads accumulate over grid tiles: a 2-tile batch must give
    the same gradient as the same batch in one tile."""
    tr = FusedNSFTrainer(flow, batch_size=256, interpret=True)
    x = _batch(3, n=256)
    g2 = jax.grad(tr.loss_fn)(tr.weights, x.T)

    tr1 = FusedNSFTrainer(flow, batch_size=256, interpret=True)
    tr1._lanes = 256
    tr1._apply = __import__(
        "nflows_tpu.ops.pallas.nsf_train", fromlist=["nsf_train_vjp_call"]
    ).nsf_train_vjp_call(tr1._indices, tr1._static, 256, True)
    g1 = jax.grad(tr1.loss_fn)(tr1.weights, x.T)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   atol=1e-5, err_msg=k)


def test_fused_adam_step_matches(flow, trainer):
    """Three Adam steps on the kernel-layout weights must land exactly
    where three Adam steps on the model's own parameters land (extraction
    is transpose/permute only — elementwise-optimizer equivalence)."""
    from nflows_tpu.ops.pallas.nsf_fused import _extract
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

    # parameters themselves coincide after the trajectory
    trained_xla = combine(state.params, state.rest)
    _, w_xla, _, _, _ = _extract(trained_xla, jnp.float32,
                                 fold_wh_scale=False)
    for k in ("w0", "wb", "wf", "bf"):
        np.testing.assert_allclose(np.asarray(weights[k]),
                                   np.asarray(w_xla[k]), atol=5e-4,
                                   err_msg=k)


def test_to_flow_roundtrip(flow, trainer):
    """to_flow(weights) must reproduce the original flow's log_prob."""
    rebuilt = trainer.to_flow()
    x = _batch(4)
    np.testing.assert_allclose(np.asarray(rebuilt.log_prob(x)),
                               np.asarray(flow.log_prob(x)), atol=1e-5)


def test_to_flow_bare_coupling_chain():
    """A permutation-less RQ coupling chain (RealNVP-style alternating
    masks) must survive train -> to_flow -> log_prob (regression: to_flow
    used to insert the extraction's None placeholder permutation into the
    rebuilt CompositeTransform)."""
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.nn import nets
    from nflows_tpu.transforms import (
        PiecewiseRationalQuadraticCouplingTransform,
    )
    from nflows_tpu.transforms.base import CompositeTransform

    mask = np.ones(6, dtype=np.float32)
    mask[::2] = -1
    keys = jax.random.split(jax.random.key(3), 3)
    chain = []
    for i in range(3):
        def create(inf, outf, _k=keys[i]):
            return nets.ResidualNet(inf, outf, hidden_features=16,
                                    num_blocks=1, key=_k)
        chain.append(PiecewiseRationalQuadraticCouplingTransform(
            mask=mask, transform_net_create_fn=create, num_bins=4,
            tails="linear", tail_bound=3.0))
        mask = mask * -1
    bare = Flow(transform=CompositeTransform(chain),
                distribution=StandardNormal([6]))
    tr = FusedNSFTrainer(bare, batch_size=128, interpret=True)
    rebuilt = tr.to_flow()
    # same flat structure back (no nesting, no None)
    assert len(rebuilt.transform.transforms) == 3
    x = _batch(6)
    np.testing.assert_allclose(np.asarray(rebuilt.log_prob(x)),
                               np.asarray(bare.log_prob(x)), atol=1e-5)


def test_lrs_fused_training_gradients():
    flow = _flow(spline="lrs", layers=2, hidden=16)
    tr = FusedNSFTrainer(flow, batch_size=128, interpret=True)
    x = _batch(5)
    fused = float(tr.loss_fn(tr.weights, x.T))
    xla = float(-flow.log_prob(x).mean())
    assert abs(fused - xla) < 1e-4
    g = jax.grad(tr.loss_fn)(tr.weights, x.T)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in g.values())


# -- conditional fused training (round 3) ---------------------------------


def _ctx(seed=7, n=128, c=3):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, c)),
        dtype=jnp.float32)


@pytest.fixture(scope="module")
def cflow():
    return _flow(context_features=3, layers=2, hidden=16)


@pytest.fixture(scope="module")
def ctrainer(cflow):
    return FusedNSFTrainer(cflow, batch_size=128, interpret=True)


def test_conditional_fused_loss_matches_xla(cflow, ctrainer):
    x, c = _batch(d=6), _ctx()
    fused = float(ctrainer.loss_fn(ctrainer.weights, x.T, c.T))
    xla = float(-cflow.log_prob(x, c).mean())
    assert abs(fused - xla) < 1e-4, (fused, xla)


def test_conditional_fused_gradients_match_xla_chain(cflow, ctrainer):
    """Weight grads (incl. the context stacks) AND the context grad must
    equal jax.grad through the XLA chain."""
    from nflows_tpu.ops.pallas.nsf_fused import _extract

    x, c = _batch(2), _ctx(8)

    g_fused, g_ctx_t = jax.grad(ctrainer.loss_fn, argnums=(0, 2))(
        ctrainer.weights, x.T, c.T)

    def xla_loss(params, rest, ctx):
        return -combine(params, rest).log_prob(x, ctx).mean()

    params, rest = partition(cflow)
    g_params, g_ctx_xla = jax.grad(xla_loss, argnums=(0, 2))(
        params, rest, c)
    grad_flow = combine(g_params, rest)
    _, g_kernel_layout, _, _, _ = _extract(grad_flow, jnp.float32,
                                           fold_wh_scale=False)

    for k in ("w0", "b0", "wb", "bb", "wf", "bf", "wc0", "wcb", "bcb"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_kernel_layout[k]),
            atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(g_ctx_t.T),
                               np.asarray(g_ctx_xla), atol=2e-4)


def test_conditional_fused_adam_step_matches(cflow, ctrainer):
    """Three conditional Adam steps coincide with the XLA trajectory."""
    from nflows_tpu.training import create_train_state, make_train_step

    opt = optax.adam(1e-2)
    step = ctrainer.make_train_step(opt, donate=False)
    weights, opt_state = ctrainer.weights, ctrainer.init_opt(opt)
    losses_fused = []
    for i in range(3):
        weights, opt_state, loss = step(
            weights, opt_state, _batch(20 + i), _ctx(30 + i))
        losses_fused.append(float(loss))

    state = create_train_state(cflow, opt)
    xla_step = make_train_step(opt, donate=False)
    losses_xla = []
    for i in range(3):
        state, metrics = xla_step(state, _batch(20 + i), _ctx(30 + i))
        losses_xla.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses_fused, losses_xla, atol=2e-4)


def test_conditional_to_flow_roundtrip(cflow, ctrainer):
    rebuilt = ctrainer.to_flow()
    x, c = _batch(4), _ctx(9)
    np.testing.assert_allclose(np.asarray(rebuilt.log_prob(x, c)),
                               np.asarray(cflow.log_prob(x, c)), atol=1e-5)


def test_embedding_net_flow_rejected():
    from nflows_tpu.nn.nets import MLP

    emb = MLP([3], [3], hidden_sizes=[8], key=jax.random.key(5))
    base = _flow(context_features=3, layers=2, hidden=16)
    with_emb = base.replace(embedding_net=emb)
    with pytest.raises(ValueError, match="embedding"):
        FusedNSFTrainer(with_emb, batch_size=128, interpret=True)


def test_embedding_net_composes_with_fused_apply():
    """The documented escape hatch: nsf_train_vjp_call(has_context=True)
    composed with an XLA embedding net — the net's parameters must get
    the same gradients as the full XLA chain."""
    from nflows_tpu.nn.nets import MLP
    from nflows_tpu.ops.pallas.nsf_fused import _extract
    from nflows_tpu.ops.pallas.nsf_train import nsf_train_vjp_call

    flow = _flow(context_features=4, layers=2, hidden=16)
    emb = MLP([3], [4], hidden_sizes=[8], key=jax.random.key(9))
    indices, weights, static, features, _ = _extract(
        flow, jnp.float32, fold_wh_scale=False)
    apply = nsf_train_vjp_call(indices, static, 128, True,
                               has_context=True)

    x = _batch(21)
    raw = jnp.asarray(np.random.default_rng(22).normal(size=(128, 3)),
                      jnp.float32)
    log_z = 0.5 * features * math.log(2.0 * math.pi)

    def fused_loss(weights, emb):
        ctx = emb(raw)                    # embedding net runs in XLA
        y_t, lad = apply(weights, x.T, ctx.T)
        lp = -0.5 * jnp.sum(y_t * y_t, axis=0) - log_z + lad[0]
        return -jnp.mean(lp)

    g_w, g_emb = jax.grad(fused_loss, argnums=(0, 1))(weights, emb)

    def xla_loss(params, rest, emb):
        ctx = emb(raw)
        return -combine(params, rest).log_prob(x, ctx).mean()

    params, rest = partition(flow)
    g_params, g_emb_xla = jax.grad(xla_loss, argnums=(0, 2))(
        params, rest, emb)

    # embedding-net gradients (flow through gctx) match the XLA chain
    fl = jax.tree_util.tree_leaves(g_emb)
    xl = jax.tree_util.tree_leaves(g_emb_xla)
    assert len(fl) == len(xl) and fl
    for a, b in zip(fl, xl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)
    # and so do the kernel weights
    grad_flow = combine(g_params, rest)
    _, g_kernel, _, _, _ = _extract(grad_flow, jnp.float32,
                                    fold_wh_scale=False)
    for k in ("w0", "wf", "wc0", "wcb"):
        np.testing.assert_allclose(np.asarray(g_w[k]),
                                   np.asarray(g_kernel[k]), atol=2e-4,
                                   err_msg=k)


def test_wide_hidden_lane_tiles_and_vmem_warning():
    """Round-5 hardware anchors: hidden 384 fits ONLY at the 128-lane
    tile (lanes 256 exceeded the 128 MiB core despite the old estimate);
    hidden 512 is estimated past the physical core and must WARN with
    XLA-chain guidance up front (the compiler still gets the final word
    — the estimate is a heuristic and must never falsely block).
    Interpret mode (no VMEM) stays silent."""
    import warnings

    import pytest

    def wide_flow(h):
        return NeuralSplineFlow(
            features=6, hidden_features=h, num_layers=10,
            num_blocks_per_layer=2, num_bins=8, key=jax.random.key(0),
            rng=np.random.default_rng(0), stacked=True)

    tr384 = FusedNSFTrainer(wide_flow(384), batch_size=1024,
                            interpret=True)
    assert tr384._lanes == 128, tr384._lanes

    with pytest.warns(UserWarning, match="likely too wide"):
        tr512 = FusedNSFTrainer(wide_flow(512), batch_size=1024,
                                interpret=False)
    assert tr512._lanes == 128
    # interpret mode has no VMEM; construction stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        FusedNSFTrainer(wide_flow(512), batch_size=1024, interpret=True)
