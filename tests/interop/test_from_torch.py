"""from_torch migration: import reference-trained weights, demand identical
log_probs / transform outputs."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_PATH = "/root/reference"
if not __import__("os").path.isdir(REFERENCE_PATH):
    pytest.skip("reference bayesiains/nflows checkout not present "
                "(CI runners have torch but no /root/reference)",
                allow_module_level=True)
BATCH, DIM = 16, 4


@pytest.fixture(scope="module")
def reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "UMNN" not in sys.modules:
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub
    import nflows
    return nflows


def _x(seed=0, shape=(BATCH, DIM)):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_maf_flow_import(reference):
    import jax
    from nflows.flows import MaskedAutoregressiveFlow as RefMAF
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.interop import from_torch

    torch.manual_seed(0)
    ref = RefMAF(features=DIM, hidden_features=16, num_layers=3,
                 num_blocks_per_layer=2)
    ours = MaskedAutoregressiveFlow(features=DIM, hidden_features=16,
                                    num_layers=3, num_blocks_per_layer=2,
                                    key=jax.random.key(0))
    ours = from_torch(ours, ref)

    x = _x(1)
    ref_lp = ref.log_prob(torch.as_tensor(x)).detach().numpy()
    our_lp = np.asarray(ours.log_prob(x))
    np.testing.assert_allclose(our_lp, ref_lp, atol=1e-4)


def test_realnvp_flow_import(reference):
    import jax
    from nflows.flows import SimpleRealNVP as RefNVP
    from nflows_tpu.flows import SimpleRealNVP
    from nflows_tpu.interop import from_torch

    torch.manual_seed(1)
    ref = RefNVP(features=DIM, hidden_features=16, num_layers=2,
                 num_blocks_per_layer=2)
    ours = SimpleRealNVP(features=DIM, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=2, key=jax.random.key(1))
    ours = from_torch(ours, ref)

    x = _x(2)
    ref_lp = ref.log_prob(torch.as_tensor(x)).detach().numpy()
    our_lp = np.asarray(ours.log_prob(x))
    np.testing.assert_allclose(our_lp, ref_lp, atol=1e-4)


def test_rq_coupling_chain_import(reference):
    import jax
    from nflows import transforms as rt
    from nflows.nn import nets as rnets
    from nflows_tpu import transforms as ot
    from nflows_tpu.nn import nets as onets
    from nflows_tpu.interop import from_torch

    torch.manual_seed(2)
    mask = np.array([1, -1, 1, -1], dtype=np.float32)
    ref = rt.CompositeTransform([
        rt.RandomPermutation(features=DIM),
        rt.PiecewiseRationalQuadraticCouplingTransform(
            mask=mask,
            transform_net_create_fn=lambda i, o: rnets.ResidualNet(
                i, o, hidden_features=16, num_blocks=2),
            num_bins=6, tails="linear", tail_bound=2.5),
    ])
    ours = ot.CompositeTransform([
        ot.RandomPermutation(DIM, rng=np.random.default_rng(0)),
        ot.PiecewiseRationalQuadraticCouplingTransform(
            mask=mask,
            transform_net_create_fn=lambda i, o: onets.ResidualNet(
                i, o, hidden_features=16, num_blocks=2,
                key=jax.random.key(2)),
            num_bins=6, tails="linear", tail_bound=2.5),
    ])
    ours = from_torch(ours, ref)

    x = _x(3)
    ry, rl = ref.forward(torch.as_tensor(x))
    oy, ol = ours.forward(x)
    np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-5)


def test_linear_family_import(reference):
    import jax
    from nflows import transforms as rt
    from nflows_tpu import transforms as ot
    from nflows_tpu.interop import from_torch

    torch.manual_seed(3)
    x = _x(4)
    pairs = [
        (rt.LULinear(DIM), ot.LULinear(DIM, key=jax.random.key(3))),
        (rt.NaiveLinear(DIM), ot.NaiveLinear(DIM, key=jax.random.key(4))),
        (rt.QRLinear(DIM, num_householder=2),
         ot.QRLinear(DIM, num_householder=2, key=jax.random.key(5))),
        (rt.SVDLinear(DIM, num_householder=2),
         ot.SVDLinear(DIM, num_householder=2, key=jax.random.key(6))),
        (rt.HouseholderSequence(DIM, num_transforms=3),
         ot.HouseholderSequence(DIM, num_transforms=3)),
    ]
    for ref, ours in pairs:
        ours = from_torch(ours, ref)
        ry, rl = ref.forward(torch.as_tensor(x))
        oy, ol = ours.forward(x)
        np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(),
                                   atol=1e-4, err_msg=type(ref).__name__)
        np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(),
                                   atol=1e-4, err_msg=type(ref).__name__)


def test_norm_and_elementwise_import(reference):
    from nflows import transforms as rt
    from nflows_tpu import transforms as ot
    from nflows_tpu.interop import from_torch

    torch.manual_seed(4)
    x = _x(5)

    # BatchNorm with nontrivial running stats (train-mode pass, then eval)
    ref_bn = rt.BatchNorm(features=DIM)
    ref_bn.train()
    ref_bn.forward(torch.as_tensor(_x(6, (64, DIM))))
    ref_bn.eval()
    our_bn = from_torch(ot.BatchNorm(features=DIM).replace(training=False), ref_bn)
    ry, rl = ref_bn.forward(torch.as_tensor(x))
    oy, ol = our_bn.forward(x)
    np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-5)

    # ActNorm after data-dependent init
    ref_an = rt.ActNorm(features=DIM)
    ref_an.train()
    ref_an.forward(torch.as_tensor(_x(7, (64, DIM))))
    our_an = from_torch(ot.ActNorm(DIM), ref_an)
    assert our_an.initialized
    ry, rl = ref_an.forward(torch.as_tensor(x))
    oy, ol = our_an.forward(x)
    np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-5)

    # learned elementwise RQ CDF
    ref_cdf = rt.PiecewiseRationalQuadraticCDF(shape=[DIM], num_bins=5,
                                               tails="linear", tail_bound=2.0)
    our_cdf = from_torch(
        ot.PiecewiseRationalQuadraticCDF(shape=[DIM], num_bins=5,
                                         tails="linear", tail_bound=2.0),
        ref_cdf)
    ry, rl = ref_cdf.forward(torch.as_tensor(x))
    oy, ol = our_cdf.forward(x)
    np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-5)


def test_conditional_flow_with_encoder_import(reference):
    import jax
    from nflows.flows.base import Flow as RefFlow
    from nflows.distributions.normal import ConditionalDiagonalNormal as RefCDN
    from nflows.transforms.autoregressive import (
        MaskedAffineAutoregressiveTransform as RefMAF,
    )
    from nflows_tpu.flows import Flow
    from nflows_tpu.distributions import ConditionalDiagonalNormal
    from nflows_tpu.nn.primitives import Dense
    from nflows_tpu.transforms import MaskedAffineAutoregressiveTransform
    from nflows_tpu.interop import from_torch

    torch.manual_seed(5)
    ref = RefFlow(
        RefMAF(features=DIM, hidden_features=16, context_features=2),
        RefCDN(shape=[DIM], context_encoder=torch.nn.Linear(2, 2 * DIM)),
    )
    ours = Flow(
        MaskedAffineAutoregressiveTransform(
            features=DIM, hidden_features=16, context_features=2,
            key=jax.random.key(7)),
        ConditionalDiagonalNormal(
            shape=[DIM], context_encoder=Dense(2, 2 * DIM,
                                               key=jax.random.key(8))),
    )
    ours = from_torch(ours, ref)

    x = _x(8)
    ctx = _x(9, (BATCH, 2))
    ref_lp = ref.log_prob(torch.as_tensor(x), context=torch.as_tensor(ctx))
    our_lp = ours.log_prob(x, context=ctx)
    np.testing.assert_allclose(np.asarray(our_lp),
                               ref_lp.detach().numpy(), atol=1e-4)


def test_shape_mismatch_raises(reference):
    import jax
    from nflows.flows import MaskedAutoregressiveFlow as RefMAF
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.interop import from_torch

    ref = RefMAF(features=DIM, hidden_features=16, num_layers=2,
                 num_blocks_per_layer=2)
    ours = MaskedAutoregressiveFlow(features=DIM, hidden_features=32,
                                    num_layers=2, num_blocks_per_layer=2,
                                    key=jax.random.key(0))
    with pytest.raises(ValueError, match="shape mismatch"):
        from_torch(ours, ref)


@pytest.mark.parametrize("use_residual_blocks", [False, True])
def test_made_batch_norm_import(reference, use_residual_blocks):
    """MADE blocks with use_batch_norm=True (reference made.py:90-160):
    transplanted weights give identical train-mode outputs (our stateless
    _BatchScale == torch BatchNorm1d batch-stats normalization)."""
    import jax
    from nflows.transforms.made import MADE as RefMADE
    from nflows_tpu.interop import from_torch
    from nflows_tpu.nn.made import MADE

    torch.manual_seed(3)
    ref = RefMADE(features=DIM, hidden_features=12, num_blocks=2,
                  output_multiplier=2, use_residual_blocks=use_residual_blocks,
                  use_batch_norm=True)
    ref.train()
    ours = MADE(features=DIM, hidden_features=12, num_blocks=2,
                output_multiplier=2, use_residual_blocks=use_residual_blocks,
                use_batch_norm=True, key=jax.random.key(0))
    ours = from_torch(ours, ref)

    x = _x(7)
    ref_y = ref(torch.as_tensor(x)).detach().numpy()
    our_y = np.asarray(ours(x))
    np.testing.assert_allclose(our_y, ref_y, atol=1e-5)


def test_stacked_chain_import(reference):
    """StackedTransform (the scan-stacked production path — the default
    for narrow NSF since round 3) imports from the reference's flat
    CompositeTransform: unstack, import per layer, restack."""
    import jax
    from nflows import transforms as rt
    from nflows.nn import nets as rnets
    from nflows_tpu import transforms as ot
    from nflows_tpu.nn import nets as onets
    from nflows_tpu.interop import from_torch
    from nflows_tpu.transforms.stacked import StackedTransform, stack_transforms

    torch.manual_seed(5)
    mask = np.array([1, -1, 1, -1], dtype=np.float32)

    def ref_layer():
        return [
            rt.RandomPermutation(features=DIM),
            rt.PiecewiseRationalQuadraticCouplingTransform(
                mask=mask,
                transform_net_create_fn=lambda i, o: rnets.ResidualNet(
                    i, o, hidden_features=16, num_blocks=2),
                num_bins=4, tails="linear", tail_bound=2.5),
        ]

    def our_layer(seed):
        return ot.CompositeTransform([
            ot.RandomPermutation(DIM, rng=np.random.default_rng(seed)),
            ot.PiecewiseRationalQuadraticCouplingTransform(
                mask=mask,
                transform_net_create_fn=lambda i, o: onets.ResidualNet(
                    i, o, hidden_features=16, num_blocks=2,
                    key=jax.random.key(seed)),
                num_bins=4, tails="linear", tail_bound=2.5),
        ])

    ref = rt.CompositeTransform(ref_layer() + ref_layer())
    ours = stack_transforms([our_layer(0), our_layer(1)])
    ours = from_torch(ours, ref)
    assert isinstance(ours, StackedTransform)

    x = _x(6)
    ry, rl = ref.forward(torch.as_tensor(x))
    oy, ol = ours.forward(x)
    np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-5)
