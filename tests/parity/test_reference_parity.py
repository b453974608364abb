"""Numerical parity against the actual reference implementation.

These tests import bayesiains/nflows from /root/reference (PyTorch CPU),
feed both libraries identical parameters/inputs, and demand agreement:

1. all four spline kernels, forward + inverse, constrained + linear tails;
2. weight-transplanted MAF (MADE) transform: forward, logabsdet, inverse;
3. weight-transplanted affine-coupling RealNVP layer with ResidualNet;
4. full-flow log_prob on transplanted models.

Skipped cleanly when torch or the reference checkout is unavailable.
"""

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


@pytest.fixture(scope="module")
def reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    # the reference hard-imports the external UMNN pip package at
    # transforms/__init__; stub it (we don't compare the UMNN path here)
    if "UMNN" not in sys.modules:
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub
    import nflows  # noqa: F401
    return nflows


def _t(x):
    return torch.as_tensor(np.asarray(x))


BATCH, DIM, K = 9, 4, 8


class TestSplineParity:
    def _inputs(self, seed, num_derivs=None, tails=False):
        rng = np.random.default_rng(seed)
        if tails:
            x = rng.normal(scale=2.0, size=(BATCH, DIM)).astype(np.float32)
        else:
            x = rng.uniform(0.05, 0.95, size=(BATCH, DIM)).astype(np.float32)
        w = rng.normal(size=(BATCH, DIM, K)).astype(np.float32)
        h = rng.normal(size=(BATCH, DIM, K)).astype(np.float32)
        d = (rng.normal(size=(BATCH, DIM, num_derivs)).astype(np.float32)
             if num_derivs else None)
        return x, w, h, d

    @pytest.mark.parametrize("inverse", [False, True])
    def test_rational_quadratic(self, reference, inverse):
        from nflows.transforms import splines as ref_splines
        from nflows_tpu.ops import splines as our_splines
        x, w, h, d = self._inputs(0, num_derivs=K + 1)
        if inverse:
            x = np.random.default_rng(9).uniform(0.05, 0.95, (BATCH, DIM)).astype(np.float32)
        ro, rl = ref_splines.rational_quadratic_spline(
            _t(x), _t(w), _t(h), _t(d), inverse=inverse)
        oo, ol = our_splines.rational_quadratic_spline(
            x, w, h, d, inverse=inverse)
        np.testing.assert_allclose(np.asarray(oo), ro.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ol), rl.numpy(), atol=2e-4)

    @pytest.mark.parametrize("inverse", [False, True])
    def test_unconstrained_rational_quadratic(self, reference, inverse):
        from nflows.transforms import splines as ref_splines
        from nflows_tpu.ops import splines as our_splines
        x, w, h, d = self._inputs(1, num_derivs=K + 1, tails=True)
        ro, rl = ref_splines.unconstrained_rational_quadratic_spline(
            _t(x), _t(w), _t(h), _t(d), inverse=inverse, tail_bound=2.0)
        oo, ol = our_splines.unconstrained_rational_quadratic_spline(
            x, w, h, d, inverse=inverse, tail_bound=2.0)
        np.testing.assert_allclose(np.asarray(oo), ro.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ol), rl.numpy(), atol=2e-4)

    @pytest.mark.parametrize("inverse", [False, True])
    def test_linear(self, reference, inverse):
        from nflows.transforms import splines as ref_splines
        from nflows_tpu.ops import splines as our_splines
        x, w, _, _ = self._inputs(2)
        ro, rl = ref_splines.linear_spline(_t(x), _t(w), inverse=inverse)
        oo, ol = our_splines.linear_spline(x, w, inverse=inverse)
        np.testing.assert_allclose(np.asarray(oo), ro.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ol), rl.numpy(), atol=2e-4)

    @pytest.mark.parametrize("inverse", [False, True])
    def test_quadratic(self, reference, inverse):
        from nflows.transforms import splines as ref_splines
        from nflows_tpu.ops import splines as our_splines
        x, w, _, h = self._inputs(3, num_derivs=K + 1)  # K+1 heights
        ro, rl = ref_splines.quadratic_spline(_t(x), _t(w), _t(h), inverse=inverse)
        oo, ol = our_splines.quadratic_spline(x, w, h, inverse=inverse)
        np.testing.assert_allclose(np.asarray(oo), ro.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ol), rl.numpy(), atol=2e-4)

    @pytest.mark.parametrize("inverse", [False, True])
    def test_cubic(self, reference, inverse):
        from nflows.transforms import splines as ref_splines
        from nflows_tpu.ops import splines as our_splines
        rng = np.random.default_rng(4)
        x = rng.uniform(0.05, 0.95, size=(BATCH, DIM)).astype(np.float32)
        w = rng.normal(size=(BATCH, DIM, K)).astype(np.float32)
        h = rng.normal(size=(BATCH, DIM, K)).astype(np.float32)
        dl = rng.normal(size=(BATCH, DIM, 1)).astype(np.float32)
        dr = rng.normal(size=(BATCH, DIM, 1)).astype(np.float32)
        ro, rl = ref_splines.cubic_spline(
            _t(x), _t(w), _t(h), _t(dl), _t(dr), inverse=inverse)
        oo, ol = our_splines.cubic_spline(x, w, h, dl, dr, inverse=inverse)
        np.testing.assert_allclose(np.asarray(oo), ro.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(ol), rl.numpy(), atol=5e-4)


def _copy_dense(ours, ref_linear):
    """torch Linear weight is [out, in]; ours is [in, out]."""
    return ours.replace(
        weight=np.ascontiguousarray(ref_linear.weight.detach().numpy().T),
        bias=ref_linear.bias.detach().numpy(),
    )


def _copy_masked(ours, ref_masked):
    new = _copy_dense(ours, ref_masked)
    # masks must already agree (same degree algebra)
    np.testing.assert_array_equal(
        np.asarray(ours.mask), ref_masked.mask.detach().numpy().T
    )
    return new


def _transplant_made(our_made, ref_made):
    updates = {}
    updates["initial_layer"] = _copy_masked(our_made.initial_layer, ref_made.initial_layer)
    if our_made.context_layer is not None:
        updates["context_layer"] = _copy_dense(our_made.context_layer, ref_made.context_layer)
    blocks = []
    for ob, rb in zip(our_made.blocks, ref_made.blocks):
        ob = ob.replace(
            linear_0=_copy_masked(ob.linear_0, rb.linear_layers[0]),
            linear_1=_copy_masked(ob.linear_1, rb.linear_layers[1]),
        )
        blocks.append(ob)
    updates["blocks"] = tuple(blocks)
    updates["final_layer"] = _copy_masked(our_made.final_layer, ref_made.final_layer)
    return our_made.replace(**updates)


class TestMAFParity:
    def test_transplanted_maf_transform(self, reference):
        import jax
        from nflows.transforms.autoregressive import (
            MaskedAffineAutoregressiveTransform as RefMAF,
        )
        from nflows_tpu.transforms import MaskedAffineAutoregressiveTransform

        torch.manual_seed(0)
        ref = RefMAF(features=DIM, hidden_features=16, num_blocks=2)
        ours = MaskedAffineAutoregressiveTransform(
            features=DIM, hidden_features=16, num_blocks=2,
            key=jax.random.key(0))
        ours = ours.replace(
            autoregressive_net=_transplant_made(ours.autoregressive_net,
                                                ref.autoregressive_net))

        x = np.random.default_rng(0).normal(size=(BATCH, DIM)).astype(np.float32)
        ry, rl = ref.forward(_t(x))
        oy, ol = ours.forward(x)
        np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-5)

        with torch.no_grad():
            rx, rli = ref.inverse(_t(np.asarray(oy)))
        ox, oli = ours.inverse(oy)
        np.testing.assert_allclose(np.asarray(ox), rx.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(oli), rli.numpy(), atol=1e-4)

    def test_transplanted_full_flow_log_prob(self, reference):
        import jax
        from nflows.flows.base import Flow as RefFlow
        from nflows.distributions.normal import StandardNormal as RefNormal
        from nflows.transforms.base import CompositeTransform as RefComposite
        from nflows.transforms.autoregressive import (
            MaskedAffineAutoregressiveTransform as RefMAF,
        )
        from nflows.transforms.permutations import ReversePermutation as RefRev

        from nflows_tpu.distributions import StandardNormal
        from nflows_tpu.flows import Flow
        from nflows_tpu.transforms import (
            CompositeTransform,
            MaskedAffineAutoregressiveTransform,
            ReversePermutation,
        )

        torch.manual_seed(1)
        ref_layers, our_layers = [], []
        for i in range(3):
            ref_layers.append(RefRev(DIM))
            our_layers.append(ReversePermutation(DIM))
            rt = RefMAF(features=DIM, hidden_features=16, num_blocks=2)
            ot = MaskedAffineAutoregressiveTransform(
                features=DIM, hidden_features=16, num_blocks=2,
                key=jax.random.key(i))
            ot = ot.replace(autoregressive_net=_transplant_made(
                ot.autoregressive_net, rt.autoregressive_net))
            ref_layers.append(rt)
            our_layers.append(ot)

        ref_flow = RefFlow(RefComposite(ref_layers), RefNormal([DIM]))
        our_flow = Flow(CompositeTransform(our_layers), StandardNormal([DIM]))

        x = np.random.default_rng(5).normal(size=(BATCH, DIM)).astype(np.float32)
        ref_lp = ref_flow.log_prob(_t(x)).detach().numpy()
        our_lp = np.asarray(our_flow.log_prob(x))
        np.testing.assert_allclose(our_lp, ref_lp, atol=1e-4)


class TestCouplingParity:
    def test_transplanted_affine_coupling(self, reference):
        import jax
        from nflows.transforms.coupling import AffineCouplingTransform as RefAff
        from nflows.nn.nets.resnet import ResidualNet as RefResNet
        from nflows_tpu.transforms import AffineCouplingTransform
        from nflows_tpu.nn.nets import ResidualNet

        mask = np.ones(DIM, dtype=np.float32)
        mask[::2] = -1

        torch.manual_seed(2)
        ref = RefAff(mask, lambda i, o: RefResNet(i, o, hidden_features=16,
                                                  num_blocks=2))
        ours = AffineCouplingTransform(
            mask, lambda i, o: ResidualNet(i, o, hidden_features=16,
                                           num_blocks=2, key=jax.random.key(0)))

        rnet, onet = ref.transform_net, ours.transform_net
        onet = onet.replace(
            initial_layer=_copy_dense(onet.initial_layer, rnet.initial_layer),
            final_layer=_copy_dense(onet.final_layer, rnet.final_layer),
            blocks=tuple(
                ob.replace(
                    linear_0=_copy_dense(ob.linear_0, rb.linear_layers[0]),
                    linear_1=_copy_dense(ob.linear_1, rb.linear_layers[1]),
                )
                for ob, rb in zip(onet.blocks, rnet.blocks)
            ),
        )
        ours = ours.replace(transform_net=onet)

        x = np.random.default_rng(1).normal(size=(BATCH, DIM)).astype(np.float32)
        ry, rl = ref.forward(_t(x))
        oy, ol = ours.forward(x)
        np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-5)

        rx, rli = ref.inverse(_t(x))
        ox, oli = ours.inverse(x)
        np.testing.assert_allclose(np.asarray(ox), rx.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(oli), rli.detach().numpy(), atol=1e-5)
