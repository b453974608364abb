"""Discrete distributions (reference: nflows/distributions/discrete.py:10-72)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.distributions.base import Distribution
from nflows_tpu.utils import shapes as shapeutils

__all__ = ["ConditionalIndependentBernoulli"]


class ConditionalIndependentBernoulli(Distribution):
    """Independent Bernoulli with logits from ``context_encoder(context)``."""

    context_encoder: object
    shape: tuple = static()

    def __init__(self, shape, context_encoder=None):
        self.shape = tuple(shape)
        self.context_encoder = context_encoder

    def _encode(self, context):
        if self.context_encoder is None:
            return context
        return self.context_encoder(context)

    def _compute_params(self, context):
        if context is None:
            raise ValueError("Context can't be None.")
        logits = self._encode(context)
        if logits.shape[0] != context.shape[0]:
            raise RuntimeError(
                "The batch dimension of the parameters is inconsistent with the input."
            )
        return logits.reshape(logits.shape[0], *self.shape)

    def _log_prob(self, inputs, context):
        if tuple(inputs.shape[1:]) != self.shape:
            raise ValueError(
                f"Expected input of shape {self.shape}, got {tuple(inputs.shape[1:])}"
            )
        logits = self._compute_params(context)
        assert logits.shape == inputs.shape
        # softplus form: stable for both signs of the logits
        log_prob = -inputs * jax.nn.softplus(-logits) \
                   - (1.0 - inputs) * jax.nn.softplus(logits)
        return shapeutils.sum_except_batch(log_prob, num_batch_dims=1)

    def _sample(self, key, num_samples, context):
        logits = self._compute_params(context)
        probs = jax.nn.sigmoid(logits)
        probs = shapeutils.repeat_rows(probs, num_samples)
        context_size = context.shape[0]
        noise = jax.random.uniform(key, (context_size * num_samples, *self.shape))
        samples = (noise < probs).astype(jnp.float32)
        return shapeutils.split_leading_dim(samples, [context_size, num_samples])

    def _mean(self, context):
        logits = self._compute_params(context)
        return jax.nn.sigmoid(logits)
