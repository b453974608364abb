"""to_torch export: train in nflows_tpu, export to the reference, demand
identical log_probs (and round-trip from_torch(to_torch(x)) == x)."""

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
DIM = 4


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


def test_maf_export_matches(reference):
    import jax
    import jax.numpy as jnp
    import optax
    from nflows.flows import MaskedAutoregressiveFlow as RefMAF
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.interop import to_torch
    from nflows_tpu.training import create_train_state, make_train_step

    ours = MaskedAutoregressiveFlow(features=DIM, hidden_features=16,
                                    num_layers=2, num_blocks_per_layer=2,
                                    key=jax.random.key(0))
    # train a little so exported weights are non-initial
    opt = optax.adam(1e-2)
    state = create_train_state(ours, opt)
    step = make_train_step(opt, donate=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, DIM)),
                    dtype=jnp.float32)
    for _ in range(5):
        state, _ = step(state, x)
    ours = state.flow

    torch.manual_seed(0)
    ref = to_torch(ours, RefMAF(features=DIM, hidden_features=16,
                                num_layers=2, num_blocks_per_layer=2))
    xt = np.random.default_rng(1).normal(size=(16, DIM)).astype(np.float32)
    ref_lp = ref.log_prob(torch.as_tensor(xt)).detach().numpy()
    our_lp = np.asarray(ours.log_prob(xt))
    np.testing.assert_allclose(our_lp, ref_lp, atol=1e-4)


def test_rq_coupling_roundtrip(reference):
    import jax
    from nflows import transforms as rt
    from nflows.nn import nets as rnets
    from nflows_tpu import transforms as ot
    from nflows_tpu.nn import nets as onets
    from nflows_tpu.interop import from_torch, to_torch

    mask = np.array([1, -1, 1, -1], dtype=np.float32)
    ours = ot.PiecewiseRationalQuadraticCouplingTransform(
        mask=mask,
        transform_net_create_fn=lambda i, o: onets.ResidualNet(
            i, o, hidden_features=16, num_blocks=2, key=jax.random.key(3)),
        num_bins=6, tails="linear", tail_bound=2.5)

    torch.manual_seed(1)
    ref = rt.PiecewiseRationalQuadraticCouplingTransform(
        mask=mask,
        transform_net_create_fn=lambda i, o: rnets.ResidualNet(
            i, o, hidden_features=16, num_blocks=2),
        num_bins=6, tails="linear", tail_bound=2.5)

    ref = to_torch(ours, ref)
    x = np.random.default_rng(2).normal(size=(16, DIM)).astype(np.float32)
    ry, rl = ref.forward(torch.as_tensor(x))
    oy, ol = ours.forward(x)
    np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-5)

    # round trip: import back and compare leaf-for-leaf
    import jax.numpy as jnp
    back = from_torch(ours, ref)
    for a, b in zip(jax.tree_util.tree_leaves(ours),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_export_shape_mismatch_raises(reference):
    import jax
    from nflows.flows import MaskedAutoregressiveFlow as RefMAF
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.interop import to_torch

    ours = MaskedAutoregressiveFlow(features=DIM, hidden_features=32,
                                    num_layers=2, num_blocks_per_layer=2,
                                    key=jax.random.key(0))
    ref = RefMAF(features=DIM, hidden_features=16, num_layers=2,
                 num_blocks_per_layer=2)
    with pytest.raises(ValueError, match="shape mismatch"):
        to_torch(ours, ref)
