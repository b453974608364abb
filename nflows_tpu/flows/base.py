"""Flow = Distribution(transform ∘ base) (reference: nflows/flows/base.py:12-120).

A ``Flow`` is itself a pytree Module, so the *entire* model — transform chain,
base distribution, embedding net — is one jit-able value::

    flow = MaskedAutoregressiveFlow(...)
    loss = jax.jit(lambda flow, x: -flow.log_prob(x).mean())(flow, batch)
    grads = jax.grad(loss_fn)(params)   # via core.module.partition/combine

Sampling takes an explicit PRNG key (first argument), otherwise the API is
the reference's: ``log_prob``, ``sample``, ``sample_and_log_prob``,
``transform_to_noise``, with the ``[context_size, num_samples, ...]`` shape
convention.
"""

from __future__ import annotations

from inspect import signature
from typing import Optional

import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.distributions.base import Distribution
from nflows_tpu.transforms.base import Transform
from nflows_tpu.utils import shapes as shapeutils

__all__ = ["Flow"]


class Flow(Distribution):
    """Base class for all flow objects."""

    transform: Transform
    distribution: Distribution
    embedding_net: object
    context_used_in_base: bool = static()

    def __init__(self, transform, distribution, embedding_net=None,
                 context_used_in_base: Optional[bool] = None):
        """Args:
            transform: a `Transform` mapping data into noise.
            distribution: base `Distribution` generating the noise.
            embedding_net: optional trainable Module encoding the context;
                trained jointly with the flow. None means identity.
            context_used_in_base: whether the base distribution consumes
                context. Default: auto-detect from the signature of
                ``distribution.log_prob`` (reference flows/base.py:28-30).
        """
        self.transform = transform
        self.distribution = distribution
        self.embedding_net = embedding_net
        if context_used_in_base is None:
            params = signature(distribution.log_prob).parameters.keys()
            context_used_in_base = "context" in params
        self.context_used_in_base = bool(context_used_in_base)

    def _embed(self, context):
        if self.embedding_net is None:
            return context
        return self.embedding_net(context)

    def _log_prob(self, inputs, context):
        embedded_context = self._embed(context)
        noise, logabsdet = self.transform.forward(inputs, context=embedded_context)
        if self.context_used_in_base:
            log_prob = self.distribution.log_prob(noise, context=embedded_context)
        else:
            log_prob = self.distribution.log_prob(noise)
        return log_prob + logabsdet

    def _sample(self, key, num_samples, context):
        embedded_context = self._embed(context)
        if self.context_used_in_base:
            noise = self.distribution.sample(key, num_samples, context=embedded_context)
        elif embedded_context is not None:
            # context-free base under a conditional transform: independent
            # noise per (context, sample) pair
            repeat_noise = self.distribution.sample(
                key, num_samples * embedded_context.shape[0]
            )
            noise = repeat_noise.reshape(
                embedded_context.shape[0], -1, *repeat_noise.shape[1:]
            )
        else:
            noise = self.distribution.sample(key, num_samples)

        if embedded_context is not None:
            noise = shapeutils.merge_leading_dims(noise, num_dims=2)
            embedded_context = shapeutils.repeat_rows(
                embedded_context, num_reps=num_samples
            )

        samples, _ = self.transform.inverse(noise, context=embedded_context)

        if embedded_context is not None:
            samples = shapeutils.split_leading_dim(samples, shape=[-1, num_samples])

        return samples

    def sample_and_log_prob(self, key, num_samples, context=None):
        """Samples + their log probs; one transform pass instead of two
        (reference flows/base.py:77-106, sign convention at :106)."""
        embedded_context = self._embed(context)
        if self.context_used_in_base:
            noise, log_prob = self.distribution.sample_and_log_prob(
                key, num_samples, context=embedded_context
            )
        elif embedded_context is not None:
            # context-free base + conditional transform: the reference's
            # path here is broken (flows/base.py:84-91 merges a noise array
            # that has no context dim); draw per-(context, sample) noise and
            # shape it [C, n, ...] so the merge/split below is consistent
            num_ctx = embedded_context.shape[0]
            flat_noise, flat_log_prob = self.distribution.sample_and_log_prob(
                key, num_samples * num_ctx
            )
            noise = flat_noise.reshape(num_ctx, num_samples, *flat_noise.shape[1:])
            log_prob = flat_log_prob.reshape(num_ctx, num_samples)
        else:
            noise, log_prob = self.distribution.sample_and_log_prob(key, num_samples)

        if embedded_context is not None:
            noise = shapeutils.merge_leading_dims(noise, num_dims=2)
            embedded_context = shapeutils.repeat_rows(
                embedded_context, num_reps=num_samples
            )

        samples, logabsdet = self.transform.inverse(noise, context=embedded_context)

        if embedded_context is not None:
            samples = shapeutils.split_leading_dim(samples, shape=[-1, num_samples])
            logabsdet = shapeutils.split_leading_dim(logabsdet, shape=[-1, num_samples])

        return samples, log_prob - logabsdet

    def transform_to_noise(self, inputs, context=None):
        """Transforms data into base-distribution noise (reference flows/base.py:108-120)."""
        noise, _ = self.transform.forward(inputs, context=self._embed(context))
        return noise
