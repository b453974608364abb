"""UMNN transform tests (reference tests cover via coupling/autoregressive tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.transforms.umnn import MonotonicNormalizer, cc_nodes_weights
from nflows_tpu.transforms.coupling import UMNNCouplingTransform
from nflows_tpu.transforms.autoregressive import MaskedUMNNAutoregressiveTransform
from nflows_tpu.nn.nets import ResidualNet
from nflows_tpu.utils import masks as maskutils
from tests.harness import assert_tensor_is_good

BATCH, DIM = 8, 6


def test_cc_quadrature_exactness():
    """CC with N nodes is exact for polynomials of degree <= N."""
    nodes, weights = cc_nodes_weights(8)
    # ∫_{-1}^{1} x^k dx
    for k, expected in [(0, 2.0), (1, 0.0), (2, 2 / 3), (4, 2 / 5), (6, 2 / 7)]:
        approx = float(np.sum(weights * nodes ** k))
        np.testing.assert_allclose(approx, expected, atol=1e-6)


def test_monotonic_normalizer_roundtrip():
    mn = MonotonicNormalizer([32, 32], cond_size=3, nb_steps=20,
                             key=jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (BATCH, DIM))
    h = jax.random.normal(jax.random.key(2), (BATCH, DIM, 3))
    z, jac = mn.forward(x, h)
    assert z.shape == x.shape and jac.shape == x.shape
    assert bool(jnp.all(jac > 0))  # monotone by construction
    x_rec = mn.inverse_transform(z, h)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)


def test_monotonic_normalizer_is_monotone():
    mn = MonotonicNormalizer([16], cond_size=1, nb_steps=16, key=jax.random.key(0))
    h = jnp.zeros((1, 1, 1))
    xs = jnp.linspace(-3, 3, 50).reshape(-1, 1)
    zs, _ = mn.forward(xs, jnp.broadcast_to(h, (50, 1, 1)))
    diffs = np.diff(np.asarray(zs[:, 0]))
    assert np.all(diffs > 0)


def test_umnn_coupling_roundtrip():
    mask = maskutils.create_alternating_binary_mask(DIM)

    def create_net(i, o):
        return ResidualNet(i, o, hidden_features=32, key=jax.random.key(3))

    t = UMNNCouplingTransform(mask, create_net, integrand_net_layers=[32, 32],
                              cond_size=4, nb_steps=16, key=jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (BATCH, DIM))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, DIM))
    assert_tensor_is_good(lad, (BATCH,))
    x_rec, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)


def test_umnn_autoregressive_forward():
    t = MaskedUMNNAutoregressiveTransform(
        features=4, hidden_features=16, integrand_net_layers=[16],
        cond_size=3, nb_steps=12, key=jax.random.key(0),
    )
    x = jax.random.normal(jax.random.key(1), (BATCH, 4))
    y, lad = t.forward(x)
    assert_tensor_is_good(y, (BATCH, 4))
    assert_tensor_is_good(lad, (BATCH,))
    x_rec, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)


def test_umnn_unconditional_transform():
    """The identity half goes through a cond_size=0 MonotonicNormalizer
    (reference coupling.py:171-173) and still round-trips."""
    import jax
    import jax.numpy as jnp

    mask = maskutils.create_alternating_binary_mask(DIM)
    def create_net(i, o):
        return ResidualNet(i, o, hidden_features=16, key=jax.random.key(3))

    t = UMNNCouplingTransform(
        mask, create_net, integrand_net_layers=[16, 16], cond_size=3,
        nb_steps=12, apply_unconditional_transform=True,
        key=jax.random.key(0))
    assert t.unconditional_transform is not None
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, DIM)),
                    dtype=jnp.float32)
    y, lad = t.forward(x)
    # identity half is now transformed too
    assert not np.allclose(np.asarray(y), np.asarray(x))
    x_rec, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=5e-3)


def test_umnn_coupling_image_roundtrip():
    """Regression: the 4D (NCHW) path crashed before the feature-major
    per-pixel param reshape (coupling.py:_image_params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nflows_tpu.nn.nets import ConvResidualNet
    from nflows_tpu.transforms import UMNNCouplingTransform

    t = UMNNCouplingTransform(
        mask=np.array([1, -1, 1, -1], dtype=np.float32),
        transform_net_create_fn=lambda i, o: ConvResidualNet(
            i, o, hidden_channels=8, num_blocks=1, key=jax.random.key(0)),
        integrand_net_layers=[16, 16],
        cond_size=4,
        nb_steps=12,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 3, 3)),
                    dtype=jnp.float32)
    y, lad = t.forward(x)
    assert y.shape == x.shape and lad.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(y)))
    x2, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv),
                               np.zeros(2), atol=1e-3)


def test_pallas_config_falls_back_off_tpu():
    """set_pallas_splines(True) off-TPU must fall back, not crash."""
    import jax

    from nflows_tpu import config

    assert jax.default_backend() == "cpu"  # conftest forces cpu
    config.set_pallas_splines(True)
    try:
        assert config.use_pallas_splines() is False
    finally:
        config.set_pallas_splines(False)
