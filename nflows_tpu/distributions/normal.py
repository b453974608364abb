"""Normal distributions (reference: nflows/distributions/normal.py).

The log-normalizer ``0.5 * D * log(2π)`` is computed in float64 on the host
at construction (matching the reference's float64 ``_log_z`` buffer,
normal.py:18-21) and baked in as a static Python float — it folds into the
compiled program as a constant, costing nothing at run time.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.distributions.base import Distribution
from nflows_tpu.utils import shapes as shapeutils

__all__ = ["StandardNormal", "ConditionalDiagonalNormal", "DiagonalNormal"]


class StandardNormal(Distribution):
    """Multivariate Normal, zero mean, unit covariance
    (reference normal.py:11-50)."""

    shape: tuple = static()
    log_z: float = static()

    def __init__(self, shape):
        self.shape = tuple(shape)
        self.log_z = float(0.5 * np.prod(self.shape) * np.log(2 * np.pi))

    def _log_prob(self, inputs, context):
        if tuple(inputs.shape[1:]) != self.shape:
            raise ValueError(
                f"Expected input of shape {self.shape}, got {tuple(inputs.shape[1:])}"
            )
        neg_energy = -0.5 * shapeutils.sum_except_batch(inputs ** 2, num_batch_dims=1)
        return neg_energy - self.log_z

    def _sample(self, key, num_samples, context):
        if context is None:
            return jax.random.normal(key, (num_samples, *self.shape))
        context_size = context.shape[0]
        samples = jax.random.normal(key, (context_size * num_samples, *self.shape))
        return shapeutils.split_leading_dim(samples, [context_size, num_samples])

    def _mean(self, context):
        if context is None:
            return jnp.zeros(self.shape)
        return jnp.zeros((context.shape[0], *self.shape))


class ConditionalDiagonalNormal(Distribution):
    """Diagonal Normal whose mean/log-std come from ``context_encoder(context)``
    split in half along the last dim (reference normal.py:53-132)."""

    context_encoder: object
    shape: tuple = static()
    log_z: float = static()

    def __init__(self, shape, context_encoder=None):
        self.shape = tuple(shape)
        self.context_encoder = context_encoder
        self.log_z = float(0.5 * np.prod(self.shape) * np.log(2 * np.pi))

    def _encode(self, context):
        if self.context_encoder is None:
            return context
        return self.context_encoder(context)

    def _compute_params(self, context):
        if context is None:
            raise ValueError("Context can't be None.")
        params = self._encode(context)
        if params.shape[-1] % 2 != 0:
            raise RuntimeError(
                "The context encoder must return a tensor whose last dimension is even."
            )
        if params.shape[0] != context.shape[0]:
            raise RuntimeError(
                "The batch dimension of the parameters is inconsistent with the input."
            )
        split = params.shape[-1] // 2
        means = params[..., :split].reshape(params.shape[0], *self.shape)
        log_stds = params[..., split:].reshape(params.shape[0], *self.shape)
        return means, log_stds

    def _log_prob(self, inputs, context):
        if tuple(inputs.shape[1:]) != self.shape:
            raise ValueError(
                f"Expected input of shape {self.shape}, got {tuple(inputs.shape[1:])}"
            )
        means, log_stds = self._compute_params(context)
        assert means.shape == inputs.shape and log_stds.shape == inputs.shape
        norm_inputs = (inputs - means) * jnp.exp(-log_stds)
        log_prob = -0.5 * shapeutils.sum_except_batch(norm_inputs ** 2, num_batch_dims=1)
        log_prob -= shapeutils.sum_except_batch(log_stds, num_batch_dims=1)
        log_prob -= self.log_z
        return log_prob

    def _sample(self, key, num_samples, context):
        means, log_stds = self._compute_params(context)
        stds = jnp.exp(log_stds)
        means = shapeutils.repeat_rows(means, num_samples)
        stds = shapeutils.repeat_rows(stds, num_samples)
        context_size = context.shape[0]
        noise = jax.random.normal(key, (context_size * num_samples, *self.shape))
        samples = means + stds * noise
        return shapeutils.split_leading_dim(samples, [context_size, num_samples])

    def _mean(self, context):
        means, _ = self._compute_params(context)
        return means


class DiagonalNormal(Distribution):
    """Diagonal Normal with trainable mean/log-std (reference normal.py:135-180)."""

    mean_: jnp.ndarray
    log_std_: jnp.ndarray
    shape: tuple = static()
    log_z: float = static()

    def __init__(self, shape):
        self.shape = tuple(shape)
        self.mean_ = jnp.zeros(self.shape).reshape(1, -1)
        self.log_std_ = jnp.zeros(self.shape).reshape(1, -1)
        self.log_z = float(0.5 * np.prod(self.shape) * np.log(2 * np.pi))

    def _log_prob(self, inputs, context):
        if tuple(inputs.shape[1:]) != self.shape:
            raise ValueError(
                f"Expected input of shape {self.shape}, got {tuple(inputs.shape[1:])}"
            )
        means = self.mean_
        log_stds = self.log_std_
        norm_inputs = (inputs - means) * jnp.exp(-log_stds)
        log_prob = -0.5 * shapeutils.sum_except_batch(norm_inputs ** 2, num_batch_dims=1)
        log_prob -= shapeutils.sum_except_batch(
            jnp.broadcast_to(log_stds, inputs.shape), num_batch_dims=1
        )
        log_prob -= self.log_z
        return log_prob

    def _sample(self, key, num_samples, context):
        raise NotImplementedError()

    def _mean(self, context):
        return self.mean_
