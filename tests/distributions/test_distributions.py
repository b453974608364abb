"""Distribution tests (reference: tests/distributions/*_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.distributions import (
    BoxUniform,
    ConditionalDiagonalNormal,
    ConditionalIndependentBernoulli,
    DiagonalNormal,
    LotkaVolterraOscillating,
    MADEMoG,
    MG1Uniform,
    StandardNormal,
)
from nflows_tpu.nn.primitives import Dense

BATCH, D, CTX = 10, 3, 4


class TestStandardNormal:
    def test_log_prob(self):
        dist = StandardNormal([D])
        x = jax.random.normal(jax.random.key(0), (BATCH, D))
        lp = dist.log_prob(x)
        assert lp.shape == (BATCH,)
        # exact gaussian values
        expected = -0.5 * np.sum(np.asarray(x) ** 2, -1) - 0.5 * D * np.log(2 * np.pi)
        np.testing.assert_allclose(np.asarray(lp), expected, atol=1e-5)

    def test_sample_and_mean(self):
        dist = StandardNormal([D])
        s = dist.sample(jax.random.key(0), 1000)
        assert s.shape == (1000, D)
        assert abs(float(s.mean())) < 0.1
        np.testing.assert_array_equal(np.asarray(dist.mean()), 0.0)

    def test_context_sampling(self):
        dist = StandardNormal([D])
        ctx = jnp.ones((5, CTX))
        s = dist.sample(jax.random.key(0), 7, context=ctx)
        assert s.shape == (5, 7, D)
        m = dist.mean(context=ctx)
        assert m.shape == (5, D)

    def test_wrong_shape_raises(self):
        dist = StandardNormal([D])
        with pytest.raises(ValueError):
            dist.log_prob(jnp.ones((BATCH, D + 1)))


class TestConditionalDiagonalNormal:
    def _dist(self):
        return ConditionalDiagonalNormal(
            [D], context_encoder=Dense(CTX, 2 * D, key=jax.random.key(0))
        )

    def test_log_prob_and_sample(self):
        dist = self._dist()
        x = jax.random.normal(jax.random.key(1), (BATCH, D))
        c = jax.random.normal(jax.random.key(2), (BATCH, CTX))
        lp = dist.log_prob(x, c)
        assert lp.shape == (BATCH,)
        s = dist.sample(jax.random.key(3), 6, context=c)
        assert s.shape == (BATCH, 6, D)
        m = dist.mean(context=c)
        assert m.shape == (BATCH, D)

    def test_none_context_raises(self):
        with pytest.raises(ValueError):
            self._dist().log_prob(jnp.ones((BATCH, D)), None)

    def test_sample_and_log_prob_consistency(self):
        dist = self._dist()
        c = jax.random.normal(jax.random.key(2), (5, CTX))
        s, lp = dist.sample_and_log_prob(jax.random.key(3), 7, context=c)
        assert s.shape == (5, 7, D) and lp.shape == (5, 7)


class TestDiagonalNormal:
    def test_log_prob(self):
        dist = DiagonalNormal([D])
        x = jax.random.normal(jax.random.key(1), (BATCH, D))
        lp = dist.log_prob(x)
        assert lp.shape == (BATCH,)
        # trainable params exist
        assert dist.num_parameters() == 2 * D


class TestBernoulli:
    def _dist(self):
        return ConditionalIndependentBernoulli(
            [D], context_encoder=Dense(CTX, D, key=jax.random.key(0))
        )

    def test_log_prob(self):
        dist = self._dist()
        x = (jax.random.uniform(jax.random.key(1), (BATCH, D)) > 0.5).astype(jnp.float32)
        c = jax.random.normal(jax.random.key(2), (BATCH, CTX))
        lp = dist.log_prob(x, c)
        assert lp.shape == (BATCH,)
        assert bool(jnp.all(lp <= 0))

    def test_sample(self):
        dist = self._dist()
        c = jax.random.normal(jax.random.key(2), (5, CTX))
        s = dist.sample(jax.random.key(3), 7, context=c)
        assert s.shape == (5, 7, D)
        vals = np.unique(np.asarray(s))
        assert set(vals).issubset({0.0, 1.0})
        m = dist.mean(context=c)
        assert bool(jnp.all((m > 0) & (m < 1)))


class TestMADEMoG:
    def test_log_prob_and_sample(self):
        dist = MADEMoG(features=D, hidden_features=16, context_features=CTX,
                       num_mixture_components=3, key=jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (BATCH, D))
        c = jax.random.normal(jax.random.key(2), (BATCH, CTX))
        lp = dist.log_prob(x, c)
        assert lp.shape == (BATCH,)
        assert not bool(jnp.any(jnp.isnan(lp)))
        s = dist.sample(jax.random.key(3), 6, context=c)
        assert s.shape == (BATCH, 6, D)
        assert not bool(jnp.any(jnp.isnan(s)))

    def test_unconditional(self):
        dist = MADEMoG(features=D, hidden_features=16, context_features=None,
                       num_mixture_components=2, key=jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (BATCH, D))
        lp = dist.log_prob(x)
        assert lp.shape == (BATCH,)
        s = dist.sample(jax.random.key(3), 6)
        assert s.shape == (6, D)

    def test_custom_initialization_mog_near_standard(self):
        """With custom init, stds should start near 1."""
        from nflows_tpu.nn.nde import MixtureOfGaussiansMADE
        made = MixtureOfGaussiansMADE(
            features=D, hidden_features=16, num_mixture_components=4,
            custom_initialization=True, key=jax.random.key(0),
        )
        x = jnp.zeros((2, D))
        out = made(x)
        _, _, stds = made._mixture_params(out, x.shape)
        np.testing.assert_allclose(np.asarray(stds), 1.0, atol=0.2)


class TestUniforms:
    def test_box_uniform(self):
        d = BoxUniform(low=-2 * jnp.ones(3), high=2 * jnp.ones(3))
        s = d.sample(jax.random.key(0), (100,))
        assert s.shape == (100, 3)
        assert bool(jnp.all((s >= -2) & (s < 2)))
        lp = d.log_prob(s)
        np.testing.assert_allclose(np.asarray(lp), 3 * -np.log(4.0), atol=1e-5)
        assert float(d.log_prob(3 * jnp.ones(3))) == -np.inf

    def test_mg1_uniform(self):
        d = MG1Uniform(low=jnp.zeros(3), high=jnp.ones(3))
        s = d.sample(jax.random.key(0), (50,))
        assert s.shape == (50, 3)
        lp = d.log_prob(s)
        assert bool(jnp.all(jnp.isfinite(lp)))

    def test_lotka_volterra(self):
        d = LotkaVolterraOscillating()
        s = d.sample(jax.random.key(0), (20,))
        assert s.shape == (20, 4)
        assert bool(jnp.all((s >= -5) & (s < 2)))
        lp = d.log_prob(s)
        assert bool(jnp.all(jnp.isfinite(lp)))
