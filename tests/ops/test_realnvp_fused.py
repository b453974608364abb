"""Fused affine/additive (RealNVP) couplings in the whole-flow megakernel.

Round-3 extension of the fused serving surface (round-2 VERDICT "weak" 4:
affine couplings fell outside every fused path): ``fuse_nsf`` now accepts
bare-coupling chains (no interleaved permutations — RealNVP's alternating
masks) with AffineCouplingTransform / AdditiveCouplingTransform layers.
fp32 kernel GEMMs in interpret mode must match the XLA chain to float
tolerance (affine has no softmax/edge reassociation, so the band is tight).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.flows import SimpleRealNVP
from nflows_tpu.ops.pallas.nsf_fused import can_fuse_nsf, fuse_nsf


def _flow(features=6, volume_preserving=False, **kw):
    return SimpleRealNVP(
        features=features, hidden_features=32, num_layers=4,
        num_blocks_per_layer=2, use_volume_preserving=volume_preserving,
        key=jax.random.key(0), **kw)


def _x(n=64, d=6, seed=0, scale=2.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, d)) * scale, jnp.float32)


@pytest.mark.parametrize("volume_preserving", [False, True])
def test_fused_matches_xla_chain(volume_preserving):
    flow = _flow(volume_preserving=volume_preserving)
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
    x = _x()

    y_ref, lad_ref = flow.transform.forward(x)
    y_f, lad_f = fused.forward(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-5)

    z_ref, ladi_ref = flow.transform.inverse(x)
    z_f, ladi_f = fused.inverse(x)
    # the kernel's manual 1/(1+exp) differs from jax.nn.sigmoid by ~1 ulp,
    # and (x-shift)/scale amplifies it on large inverse outputs: rtol band
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_f),
                               atol=1e-5, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(ladi_ref), np.asarray(ladi_f),
                               atol=1e-5, rtol=2e-6)

    lp_ref = flow.log_prob(x)
    lp_f = fused.log_prob(x)
    np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_f),
                               atol=1e-4)


def test_fused_sampling_matches_xla():
    """Same key => identical noise => samples must agree with the XLA
    endpoint elementwise."""
    flow = _flow()
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
    key = jax.random.key(3)
    s_ref = flow.sample(key, 64)
    s_f = fused.sample(key, 64)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_f), atol=1e-5)


def test_additive_logdet_is_zero():
    flow = _flow(volume_preserving=True)
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
    _, lad = fused.forward(_x())
    np.testing.assert_allclose(np.asarray(lad), 0.0, atol=0.0)


def test_general_scale_activation_fused():
    from nflows_tpu.nn import nets
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.transforms import AffineCouplingTransform
    from nflows_tpu.transforms.base import CompositeTransform

    mask = np.ones(6, dtype=np.float32)
    mask[::2] = -1
    keys = jax.random.split(jax.random.key(1), 3)
    layers = []
    for i in range(3):
        def create(inf, outf, _k=keys[i]):
            return nets.ResidualNet(inf, outf, hidden_features=32,
                                    num_blocks=2, key=_k)
        layers.append(AffineCouplingTransform(
            mask=mask, transform_net_create_fn=create,
            scale_activation=AffineCouplingTransform.GENERAL_SCALE_ACTIVATION))
        mask = mask * -1
    flow = Flow(transform=CompositeTransform(layers),
                distribution=StandardNormal([6]))
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
    x = _x(seed=4)
    y_ref, lad_ref = flow.transform.forward(x)
    y_f, lad_f = fused.forward(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-5)


def test_batchnorm_between_layers_not_fusable():
    flow = _flow(batch_norm_between_layers=True)
    assert not can_fuse_nsf(flow)


def test_fused_training_accepts_affine():
    # round-3 session 2: affine couplings TRAIN fused now (full
    # loss/grad/trajectory coverage in tests/ops/test_nsf_train_families.py)
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    tr = FusedNSFTrainer(_flow(), batch_size=128, interpret=True)
    assert tr._static["spline"] in ("affine", "additive")


def test_serving_autoselects_fused_realnvp():
    from nflows_tpu import serving

    flow = _flow()
    compiled = serving.CompiledFlow(flow, batch_size=64, features=6,
                                    num_samples=64, use_fused=True)
    assert compiled.is_fused
    x = _x()
    lp_ref = flow.log_prob(x)
    lp_f = compiled.log_prob(x)
    np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_f),
                               atol=1e-4)
