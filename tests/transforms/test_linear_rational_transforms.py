"""Linear-rational-spline transform classes (beyond-reference family)."""

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.nn.nets import ResidualNet
from nflows_tpu.transforms import (
    MaskedPiecewiseLinearRationalAutoregressiveTransform,
    PiecewiseLinearRationalCDF,
    PiecewiseLinearRationalCouplingTransform,
)

BATCH, DIM = 16, 4


def _coupling(tails):
    mask = np.array([1, -1, 1, -1], dtype=np.float32)
    return PiecewiseLinearRationalCouplingTransform(
        mask=mask,
        transform_net_create_fn=lambda i, o: ResidualNet(
            i, o, hidden_features=16, num_blocks=2, key=jax.random.key(0)),
        num_bins=6, tails=tails, tail_bound=2.0 if tails else 1.0,
    )


def test_coupling_roundtrip_constrained():
    t = _coupling(None)
    x = jnp.asarray(np.random.default_rng(0).uniform(0.05, 0.95,
                                                     size=(BATCH, DIM)),
                    dtype=jnp.float32)
    y, lad = t.forward(x)
    assert lad.shape == (BATCH,)
    x2, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)
    # identity half passes through
    np.testing.assert_allclose(np.asarray(y[:, 1]), np.asarray(x[:, 1]))


def test_coupling_roundtrip_tails():
    t = _coupling("linear")
    x = jnp.asarray(np.random.default_rng(1).normal(scale=1.5,
                                                    size=(BATCH, DIM)),
                    dtype=jnp.float32)
    y, lad = jax.jit(t.forward)(x)
    x2, lad_inv = jax.jit(t.inverse)(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)


def test_autoregressive_roundtrip_and_property():
    t = MaskedPiecewiseLinearRationalAutoregressiveTransform(
        features=DIM, hidden_features=16, num_bins=5, tails="linear",
        tail_bound=2.0, key=jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(BATCH, DIM)),
                    dtype=jnp.float32)
    y, lad = t.forward(x)
    x2, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)
    # autoregressive property: dy_k/dx_j = 0 for j > k
    jac = jax.jacobian(lambda xi: t.forward(xi[None])[0][0])(x[0])
    np.testing.assert_allclose(np.asarray(jnp.triu(jac, k=1)), 0.0, atol=1e-6)


def test_cdf_roundtrip():
    t = PiecewiseLinearRationalCDF(shape=[DIM], num_bins=5, tails="linear",
                                   tail_bound=2.0, key=jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(BATCH, DIM)),
                    dtype=jnp.float32)
    y, lad = t.forward(x)
    x2, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)


def test_nsf_style_flow_trains():
    """An LRS coupling flow trains on moons (full integration)."""
    import optax

    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.training import create_train_state, make_train_step
    from nflows_tpu.transforms import CompositeTransform
    from nflows_tpu.utils.datasets import make_moons

    layers = []
    for i in range(3):
        # NOTE: no permutation — mask alternation does the swapping (a
        # ReversePermutation here would cancel the alternating mask signs
        # and leave one coordinate untransformed)
        layers.append(PiecewiseLinearRationalCouplingTransform(
            mask=np.array([1, -1]) * (1 if i % 2 else -1),
            transform_net_create_fn=lambda i_, o_, _k=i: ResidualNet(
                i_, o_, hidden_features=24, num_blocks=1,
                key=jax.random.key(7 + _k)),
            num_bins=6, tails="linear", tail_bound=3.0))
    flow = Flow(CompositeTransform(layers), StandardNormal([2]))

    X, _ = make_moons(1024, noise=0.1, rng=np.random.default_rng(0))
    X = ((X - X.mean(0)) / X.std(0)).astype(np.float32)
    opt = optax.adam(3e-3)
    state = create_train_state(flow, opt)
    step = make_train_step(opt, donate=False)
    rng = np.random.default_rng(1)
    m0 = None
    for i in range(150):
        idx = rng.integers(0, len(X), 128)
        state, m = step(state, jnp.asarray(X[idx]))
        if m0 is None:
            m0 = float(m["loss"])
    assert float(m["loss"]) < m0
