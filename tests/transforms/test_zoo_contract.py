"""Zoo-wide contract sweep: every exported Transform class upholds the
framework invariants (forward shape, logabsdet [batch], inverse round-trip
where an inverse exists) — one parametrized test so a newly added transform
cannot ship without at least contract coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nflows_tpu.transforms as T
from nflows_tpu.nn.nets import ResidualNet

BATCH, DIM = 8, 4


def _net(i, o):
    return ResidualNet(i, o, hidden_features=16, num_blocks=1,
                       key=jax.random.key(0))


_MASK = np.array([1, -1, 1, -1], dtype=np.float32)
_RNG = lambda: np.random.default_rng(0)

# name -> (constructor, input domain (lo, hi), round-trip tolerance)
ZOO = {
    "IdentityTransform": (lambda: T.IdentityTransform(), (-2, 2), 1e-6),
    "PointwiseAffineTransform": (
        lambda: T.PointwiseAffineTransform(shift=0.3, scale=1.7), (-2, 2), 1e-5),
    "Exp": (lambda: T.Exp(), (-2, 1), 1e-4),
    "Tanh": (lambda: T.Tanh(), (-1.5, 1.5), 1e-3),
    "LogTanh": (lambda: T.LogTanh(), (-3, 3), 1e-3),
    "LeakyReLU": (lambda: T.LeakyReLU(), (-2, 2), 1e-5),
    "Sigmoid": (lambda: T.Sigmoid(), (-2, 2), 1e-4),
    "Logit": (lambda: T.Logit(), (0.05, 0.95), 1e-4),
    "CauchyCDF": (lambda: T.CauchyCDF(), (-2, 2), 1e-4),
    "Permutation": (
        lambda: T.Permutation(np.array([2, 0, 3, 1])), (-2, 2), 1e-6),
    "RandomPermutation": (
        lambda: T.RandomPermutation(DIM, rng=_RNG()), (-2, 2), 1e-6),
    "ReversePermutation": (lambda: T.ReversePermutation(DIM), (-2, 2), 1e-6),
    "NaiveLinear": (
        lambda: T.NaiveLinear(DIM, key=jax.random.key(0)), (-2, 2), 1e-4),
    "LULinear": (
        lambda: T.LULinear(DIM, key=jax.random.key(0)), (-2, 2), 1e-4),
    "QRLinear": (
        lambda: T.QRLinear(DIM, num_householder=2, key=jax.random.key(0)),
        (-2, 2), 1e-4),
    "SVDLinear": (
        lambda: T.SVDLinear(DIM, num_householder=2, key=jax.random.key(0)),
        (-2, 2), 1e-4),
    "HouseholderSequence": (
        lambda: T.HouseholderSequence(DIM, num_transforms=3), (-2, 2), 1e-4),
    "AffineCouplingTransform": (
        lambda: T.AffineCouplingTransform(_MASK, _net), (-2, 2), 1e-4),
    "AdditiveCouplingTransform": (
        lambda: T.AdditiveCouplingTransform(_MASK, _net), (-2, 2), 1e-4),
    "PiecewiseLinearCouplingTransform": (
        lambda: T.PiecewiseLinearCouplingTransform(
            _MASK, _net, num_bins=4, tails="linear", tail_bound=2.0),
        (-1.8, 1.8), 5e-3),
    "PiecewiseQuadraticCouplingTransform": (
        lambda: T.PiecewiseQuadraticCouplingTransform(
            _MASK, _net, num_bins=4, tails="linear", tail_bound=2.0),
        (-1.8, 1.8), 1e-3),
    "PiecewiseCubicCouplingTransform": (
        lambda: T.PiecewiseCubicCouplingTransform(
            _MASK, _net, num_bins=4, tails="linear", tail_bound=2.0),
        (-1.8, 1.8), 1e-3),
    "PiecewiseRationalQuadraticCouplingTransform": (
        lambda: T.PiecewiseRationalQuadraticCouplingTransform(
            _MASK, _net, num_bins=4, tails="linear", tail_bound=2.0),
        (-1.8, 1.8), 1e-3),
    "PiecewiseLinearRationalCouplingTransform": (
        lambda: T.PiecewiseLinearRationalCouplingTransform(
            _MASK, _net, num_bins=4, tails="linear", tail_bound=2.0),
        (-1.8, 1.8), 1e-3),
    "MaskedAffineAutoregressiveTransform": (
        lambda: T.MaskedAffineAutoregressiveTransform(
            DIM, 16, key=jax.random.key(0)), (-2, 2), 1e-3),
    "MaskedPiecewiseLinearAutoregressiveTransform": (
        # num_bins comes FIRST for this class (reference arg order)
        lambda: T.MaskedPiecewiseLinearAutoregressiveTransform(
            4, DIM, 16, key=jax.random.key(0)), (0.05, 0.95), 5e-3),
    "MaskedPiecewiseQuadraticAutoregressiveTransform": (
        lambda: T.MaskedPiecewiseQuadraticAutoregressiveTransform(
            DIM, 16, num_bins=4, tails="linear", tail_bound=2.0,
            key=jax.random.key(0)), (-1.8, 1.8), 1e-3),
    "MaskedPiecewiseCubicAutoregressiveTransform": (
        lambda: T.MaskedPiecewiseCubicAutoregressiveTransform(
            4, DIM, 16, key=jax.random.key(0)), (0.05, 0.95), 1e-3),
    "MaskedPiecewiseRationalQuadraticAutoregressiveTransform": (
        lambda: T.MaskedPiecewiseRationalQuadraticAutoregressiveTransform(
            DIM, 16, num_bins=4, tails="linear", tail_bound=2.0,
            key=jax.random.key(0)), (-1.8, 1.8), 1e-3),
    "MaskedPiecewiseLinearRationalAutoregressiveTransform": (
        lambda: T.MaskedPiecewiseLinearRationalAutoregressiveTransform(
            DIM, 16, num_bins=4, tails="linear", tail_bound=2.0,
            key=jax.random.key(0)), (-1.8, 1.8), 1e-3),
    "PiecewiseLinearCDF": (
        lambda: T.PiecewiseLinearCDF([DIM], num_bins=4, tails="linear",
                                     tail_bound=2.0, key=jax.random.key(0)),
        (-1.8, 1.8), 5e-3),
    "PiecewiseQuadraticCDF": (
        lambda: T.PiecewiseQuadraticCDF([DIM], num_bins=4, tails="linear",
                                        tail_bound=2.0, key=jax.random.key(0)),
        (-1.8, 1.8), 1e-3),
    "PiecewiseCubicCDF": (
        lambda: T.PiecewiseCubicCDF([DIM], num_bins=4, tails="linear",
                                    tail_bound=2.0, key=jax.random.key(0)),
        (-1.8, 1.8), 1e-3),
    "PiecewiseRationalQuadraticCDF": (
        lambda: T.PiecewiseRationalQuadraticCDF(
            [DIM], num_bins=4, tails="linear", tail_bound=2.0,
            key=jax.random.key(0)), (-1.8, 1.8), 1e-3),
    "PiecewiseLinearRationalCDF": (
        lambda: T.PiecewiseLinearRationalCDF(
            [DIM], num_bins=4, tails="linear", tail_bound=2.0,
            key=jax.random.key(0)), (-1.8, 1.8), 1e-3),
    "UMNNCouplingTransform": (
        lambda: T.UMNNCouplingTransform(
            _MASK, _net, integrand_net_layers=[16], cond_size=3, nb_steps=12),
        (-1.5, 1.5), 5e-3),
    "MaskedUMNNAutoregressiveTransform": (
        lambda: T.MaskedUMNNAutoregressiveTransform(
            DIM, 16, integrand_net_layers=[16], cond_size=3, nb_steps=12,
            key=jax.random.key(0)), (-1.5, 1.5), 5e-3),
    "BatchNorm(eval)": (
        lambda: T.BatchNorm(DIM).replace(training=False), (-2, 2), 1e-4),
    "ActNorm": (lambda: T.ActNorm(DIM), (-2, 2), 1e-4),
}


@pytest.mark.parametrize("name", sorted(ZOO))
def test_zoo_contract(name):
    make, (lo, hi), tol = ZOO[name]
    t = make()
    x = jnp.asarray(
        np.random.default_rng(1).uniform(lo, hi, size=(BATCH, DIM)),
        dtype=jnp.float32)
    y, lad = t.forward(x)
    assert y.shape == x.shape, name
    assert lad.shape == (BATCH,), name
    assert bool(jnp.all(jnp.isfinite(y))), name
    assert bool(jnp.all(jnp.isfinite(lad))), name

    x2, lad_inv = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=tol,
                               err_msg=name)
    np.testing.assert_allclose(np.asarray(lad + lad_inv),
                               np.zeros(BATCH), atol=max(tol, 1e-3),
                               err_msg=name)
