"""Distribution protocol (reference: nflows/distributions/base.py:16-128).

Same API surface as the reference with one deliberate change: sampling takes
an explicit PRNG ``key`` (JAX has no global RNG state), so

    reference: dist.sample(num_samples, context)
    here:      dist.sample(key, num_samples, context)

Shape contracts are identical:

- ``log_prob(inputs[B, ...], context[B, ...]) -> [B]``
- ``sample(key, n)               -> [n, ...]``
- ``sample(key, n, context[C,..]) -> [C, n, ...]``
- ``sample_and_log_prob`` returns both, context-split the same way.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nflows_tpu.core.module import Module
from nflows_tpu.utils import shapes as shapeutils
import nflows_tpu.utils.typechecks as check

__all__ = ["Distribution", "NoMeanException"]

Array = jnp.ndarray


class NoMeanException(Exception):
    """Thrown when a mean function doesn't exist."""


class Distribution(Module):
    """Base class for all distribution objects."""

    def log_prob(self, inputs: Array, context: Optional[Array] = None) -> Array:
        """Log probability of ``inputs`` (optionally given ``context``).

        Returns a Tensor of shape [batch], matching the reference contract
        (nflows/distributions/base.py:22-40).
        """
        inputs = jnp.asarray(inputs)
        if context is not None:
            context = jnp.asarray(context)
            if inputs.shape[0] != context.shape[0]:
                raise ValueError(
                    "Number of input items must be equal to number of context items."
                )
        return self._log_prob(inputs, context)

    def _log_prob(self, inputs, context):
        raise NotImplementedError()

    def sample(
        self,
        key: jax.Array,
        num_samples: int,
        context: Optional[Array] = None,
        batch_size: Optional[int] = None,
    ) -> Array:
        """Draw samples; shape [n, ...] or [context_size, n, ...] with context
        (reference nflows/distributions/base.py:45-81)."""
        if not check.is_positive_int(num_samples):
            raise TypeError("Number of samples must be a positive integer.")
        if context is not None:
            context = jnp.asarray(context)

        if batch_size is None:
            return self._sample(key, num_samples, context)

        if not check.is_positive_int(batch_size):
            raise TypeError("Batch size must be a positive integer.")

        num_batches = num_samples // batch_size
        num_leftover = num_samples % batch_size
        keys = jax.random.split(key, num_batches + (1 if num_leftover else 0))
        samples = [self._sample(keys[i], batch_size, context) for i in range(num_batches)]
        if num_leftover > 0:
            samples.append(self._sample(keys[-1], num_leftover, context))
        # With context, samples are [C, n_i, ...]: concat along the sample dim.
        axis = 1 if context is not None else 0
        return jnp.concatenate(samples, axis=axis)

    def _sample(self, key, num_samples, context):
        raise NotImplementedError()

    def sample_and_log_prob(
        self, key: jax.Array, num_samples: int, context: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        """Samples together with their log probability
        (reference nflows/distributions/base.py:86-120)."""
        samples = self.sample(key, num_samples, context=context)

        if context is not None:
            samples = shapeutils.merge_leading_dims(samples, num_dims=2)
            context = shapeutils.repeat_rows(context, num_reps=num_samples)
            assert samples.shape[0] == context.shape[0]

        log_prob = self.log_prob(samples, context=context)

        if context is not None:
            samples = shapeutils.split_leading_dim(samples, shape=[-1, num_samples])
            log_prob = shapeutils.split_leading_dim(log_prob, shape=[-1, num_samples])

        return samples, log_prob

    def mean(self, context: Optional[Array] = None) -> Array:
        if context is not None:
            context = jnp.asarray(context)
        return self._mean(context)

    def _mean(self, context):
        raise NoMeanException()
