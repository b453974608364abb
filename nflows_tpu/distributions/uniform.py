"""sbi-oriented utility distributions (reference: nflows/distributions/uniform.py:7-89).

The reference builds these on torch.distributions; here they are small
self-contained classes with the same surface (``log_prob(value)``,
``sample(key, sample_shape)`` — key-first, as everywhere in this library).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["BoxUniform", "MG1Uniform", "LotkaVolterraOscillating"]


class BoxUniform:
    """Multidimensional uniform on a box; the last ``reinterpreted_batch_ndims``
    dims are event dims summed in log_prob (reference uniform.py:7-31)."""

    def __init__(self, low, high, reinterpreted_batch_ndims: int = 1):
        self.low = jnp.asarray(low, dtype=jnp.float32)
        self.high = jnp.asarray(high, dtype=jnp.float32)
        if self.low.shape != self.high.shape:
            raise ValueError("low and high must have the same shape.")
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims

    @property
    def event_shape(self):
        nd = self.reinterpreted_batch_ndims
        return self.low.shape[len(self.low.shape) - nd:]

    def log_prob(self, value):
        value = jnp.asarray(value)
        inside = (value >= self.low) & (value < self.high)
        lp = jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)
        nd = self.reinterpreted_batch_ndims
        return jnp.sum(lp, axis=tuple(range(lp.ndim - nd, lp.ndim)))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.low.shape
        return jax.random.uniform(key, shape, minval=self.low, maxval=self.high)


class MG1Uniform:
    """Uniform under the M/G/1 reparameterization A (reference uniform.py:34-47)."""

    _A = np.array([[1.0, -1.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                  dtype=np.float32)
    _A_inv = np.array([[1.0, 1.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                      dtype=np.float32)

    def __init__(self, low, high):
        self.low = jnp.asarray(low, dtype=jnp.float32)
        self.high = jnp.asarray(high, dtype=jnp.float32)

    def _uniform_log_prob(self, noise):
        inside = (noise >= self.low) & (noise < self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)

    def log_prob(self, value):
        return self._uniform_log_prob(self._to_noise(value))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.low.shape
        noise = jax.random.uniform(key, shape, minval=self.low, maxval=self.high)
        return self._to_parameters(noise)

    def _to_parameters(self, noise):
        return noise @ jnp.asarray(self._A_inv)

    def _to_noise(self, parameters):
        return parameters @ jnp.asarray(self._A)


class LotkaVolterraOscillating:
    """Truncated-gaussian prior used in sbi benchmarks
    (reference uniform.py:50-89). Sampling is host-side rejection, matching
    the reference's while-loop (not a jit path)."""

    def __init__(self):
        self.mean = jnp.log(jnp.asarray([0.01, 0.5, 1.0, 0.01]))
        self.sigma = 0.5
        self._uniform = BoxUniform(low=-5 * jnp.ones(4), high=2 * jnp.ones(4))
        # same normalizer expression as the reference (uniform.py:59-62)
        from jax.scipy.special import erf
        self._log_normalizer = -jnp.log(
            erf((2 - self.mean) / self.sigma) - erf((-5 - self.mean) / self.sigma)
        ).sum()

    def _gaussian_log_prob(self, value):
        d = value.shape[-1]
        diff = (value - self.mean) / self.sigma
        return -0.5 * jnp.sum(diff ** 2, axis=-1) \
               - 0.5 * d * jnp.log(2 * jnp.pi * self.sigma ** 2)

    def log_prob(self, value):
        value = jnp.asarray(value)
        unnormalized = self._gaussian_log_prob(value) + self._uniform.log_prob(value)
        return self._log_normalizer + unnormalized

    def sample(self, key, sample_shape=()):
        num = int(np.prod(sample_shape)) if sample_shape else 1
        collected = []
        remaining = num
        while remaining > 0:
            key, sub = jax.random.split(key)
            candidates = self.mean + self.sigma * jax.random.normal(sub, (remaining, 4))
            ulp = self._uniform.log_prob(candidates)
            accepted = np.asarray(candidates)[~np.isinf(np.asarray(ulp))]
            collected.append(accepted)
            remaining -= accepted.shape[0]
        samples = np.concatenate(collected)[:num]
        return jnp.asarray(samples.reshape(*sample_shape, 4) if sample_shape
                           else samples[0])
