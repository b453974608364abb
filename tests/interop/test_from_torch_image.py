"""from_torch migration for the image-flow family and remaining components:
multiscale Glow chain (squeeze + actnorm + 1x1 conv + conv coupling),
ConvResidualNet, MADEMoG, MLP encoders."""

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
    if "UMNN" not in sys.modules:
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub
    import nflows
    return nflows


def test_glow_style_multiscale_import(reference):
    import jax
    from nflows import transforms as rt
    from nflows.nn import nets as rnets
    from nflows.utils import create_mid_split_binary_mask as ref_mask
    from nflows_tpu import transforms as ot
    from nflows_tpu.nn.nets import ConvResidualNet
    from nflows_tpu.utils.masks import create_mid_split_binary_mask
    from nflows_tpu.interop import from_torch

    torch.manual_seed(0)
    c, h, w = 3, 8, 8

    def build_ref():
        mct = rt.MultiscaleCompositeTransform(num_transforms=2)
        shape = (c, h, w)
        for level in range(2):
            sc = 4 * shape[0]
            layers = [rt.SqueezeTransform(factor=2)]
            for _ in range(2):
                layers.append(rt.ActNorm(sc))
                layers.append(rt.OneByOneConvolution(sc))
                layers.append(rt.AffineCouplingTransform(
                    mask=ref_mask(sc),
                    transform_net_create_fn=lambda i, o: rnets.ConvResidualNet(
                        i, o, hidden_channels=8, num_blocks=1)))
            shape = mct.add_transform(
                rt.CompositeTransform(layers),
                (sc, shape[1] // 2, shape[2] // 2))
        return mct

    def build_ours():
        key = jax.random.key(0)
        rng = np.random.default_rng(0)
        builder = ot.MultiscaleCompositeTransform.builder(num_transforms=2)
        shape = (c, h, w)
        for level in range(2):
            sc = 4 * shape[0]
            layers = [ot.SqueezeTransform(factor=2)]
            for _ in range(2):
                key, k1, k2 = jax.random.split(key, 3)
                layers.append(ot.ActNorm(sc))
                layers.append(ot.OneByOneConvolution(sc, key=k1, rng=rng))
                layers.append(ot.AffineCouplingTransform(
                    mask=create_mid_split_binary_mask(sc),
                    transform_net_create_fn=lambda i, o, _k=k2:
                        ConvResidualNet(i, o, hidden_channels=8,
                                        num_blocks=1, key=_k)))
            shape = builder.add_transform(
                ot.CompositeTransform(layers),
                (sc, shape[1] // 2, shape[2] // 2))
        return builder.build()

    ref = build_ref()
    ours = from_torch(build_ours(), ref)

    # put the reference ActNorms through their lazy init, then re-import
    x = np.random.default_rng(1).normal(size=(4, c, h, w)).astype(np.float32)
    ref.train()
    ref.forward(torch.as_tensor(x))
    ref.eval()
    ours = from_torch(ours, ref)

    ry, rl = ref.forward(torch.as_tensor(x))
    oy, ol = ours.forward(x)
    np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(), atol=1e-4)

    # inverse (sampling direction) too
    rx, rli = ref.inverse(torch.as_tensor(np.asarray(oy)))
    ox, oli = ours.inverse(oy)
    np.testing.assert_allclose(np.asarray(ox), rx.detach().numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(oli), rli.detach().numpy(), atol=1e-3)


def test_stacked_glow_import(reference):
    """GlowFlow(stacked=True) levels are [squeeze, StackedTransform] while
    the reference level is a flat chain — from_torch must align the stack
    against its k reference transforms (regression: 'composite transform
    length mismatch')."""
    import jax
    from nflows import transforms as rt
    from nflows.nn import nets as rnets
    from nflows.utils import create_mid_split_binary_mask as ref_mask
    from nflows_tpu.interop import from_torch
    from nflows_tpu.models.glow import GlowFlow

    torch.manual_seed(3)
    c, h, w = 3, 8, 8
    levels, steps, hidden = 2, 2, 8

    mct = rt.MultiscaleCompositeTransform(num_transforms=levels)
    shape = (c, h, w)
    for _ in range(levels):
        sc = 4 * shape[0]
        layers = [rt.SqueezeTransform(factor=2)]
        for _ in range(steps):
            layers.append(rt.ActNorm(sc))
            layers.append(rt.OneByOneConvolution(sc))
            layers.append(rt.AffineCouplingTransform(
                mask=ref_mask(sc),
                transform_net_create_fn=lambda i, o: rnets.ConvResidualNet(
                    i, o, hidden_channels=hidden, num_blocks=2)))
        shape = mct.add_transform(
            rt.CompositeTransform(layers),
            (sc, shape[1] // 2, shape[2] // 2))

    ours = GlowFlow((c, h, w), num_levels=levels, steps_per_level=steps,
                    hidden_channels=hidden, coupling="affine",
                    key=jax.random.key(0), stacked=True)

    # lazy-init the reference ActNorms, then import
    x = np.random.default_rng(5).normal(size=(4, c, h, w)).astype(np.float32)
    mct.train()
    mct.forward(torch.as_tensor(x))
    mct.eval()
    imported = from_torch(ours.transform, mct)

    ry, rl = mct.forward(torch.as_tensor(x))
    oy, ol = imported.forward(x)
    np.testing.assert_allclose(np.asarray(oy), ry.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ol), rl.detach().numpy(),
                               atol=1e-4)


def test_mademog_import(reference):
    import jax
    from nflows.distributions import MADEMoG as RefMADEMoG
    from nflows_tpu.distributions import MADEMoG
    from nflows_tpu.interop import from_torch

    torch.manual_seed(1)
    ref = RefMADEMoG(features=3, hidden_features=16, context_features=None,
                     num_blocks=2, num_mixture_components=4)
    ours = MADEMoG(features=3, hidden_features=16, context_features=None,
                   num_blocks=2, num_mixture_components=4,
                   key=jax.random.key(0))
    ours = from_torch(ours, ref)

    x = np.random.default_rng(2).normal(size=(16, 3)).astype(np.float32)
    ref_lp = ref.log_prob(torch.as_tensor(x)).detach().numpy()
    our_lp = np.asarray(ours.log_prob(x))
    np.testing.assert_allclose(our_lp, ref_lp, atol=1e-4)


def test_mlp_encoder_import(reference):
    import jax
    from nflows.nn.nets import MLP as RefMLP
    from nflows_tpu.nn.nets import MLP
    from nflows_tpu.interop import from_torch

    torch.manual_seed(2)
    ref = RefMLP([4], [6], hidden_sizes=[8, 8])
    ours = MLP([4], [6], hidden_sizes=[8, 8], key=jax.random.key(0))
    ours = from_torch(ours, ref)

    x = np.random.default_rng(3).normal(size=(5, 4)).astype(np.float32)
    ref_y = ref(torch.as_tensor(x)).detach().numpy()
    our_y = np.asarray(ours(x))
    np.testing.assert_allclose(our_y, ref_y, atol=1e-5)
