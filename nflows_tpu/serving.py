"""Serving: ahead-of-time compiled, fixed-shape flow endpoints.

For deployment, compile the three inference entry points once (AOT via
``jit(...).lower().compile()``) for fixed batch shapes, so serving never
pays tracing/compilation at request time and rejects shape drift loudly.

    served = CompiledFlow(flow, batch_size=1024, features=6)
    lp = served.log_prob(x)                 # x: [1024, 6]
    s  = served.sample(key)                 # [num_samples, 6]
    s, lp = served.sample_and_log_prob(key)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["CompiledFlow"]


class CompiledFlow:
    """Fixed-shape AOT-compiled wrapper around a Flow."""

    def __init__(self, flow, batch_size: int, features: int,
                 num_samples: Optional[int] = None,
                 context_features: Optional[int] = None,
                 dtype=jnp.float32):
        self._flow = flow
        self.batch_size = batch_size
        self.features = features
        self.num_samples = num_samples or batch_size
        self.context_features = context_features

        x_spec = jax.ShapeDtypeStruct((batch_size, features), dtype)
        key_spec = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

        if context_features is None:
            self._log_prob = (
                jax.jit(lambda f, x: f.log_prob(x))
                .lower(flow, x_spec).compile()
            )
            self._sample = (
                jax.jit(lambda f, k: f.sample(k, self.num_samples))
                .lower(flow, key_spec).compile()
            )
            self._sample_and_log_prob = (
                jax.jit(lambda f, k: f.sample_and_log_prob(k, self.num_samples))
                .lower(flow, key_spec).compile()
            )
        else:
            c_spec = jax.ShapeDtypeStruct((batch_size, context_features), dtype)
            self._log_prob = (
                jax.jit(lambda f, x, c: f.log_prob(x, c))
                .lower(flow, x_spec, c_spec).compile()
            )
            self._sample = (
                jax.jit(lambda f, k, c: f.sample(k, self.num_samples, context=c))
                .lower(flow, key_spec, c_spec).compile()
            )
            self._sample_and_log_prob = (
                jax.jit(lambda f, k, c: f.sample_and_log_prob(
                    k, self.num_samples, context=c))
                .lower(flow, key_spec, c_spec).compile()
            )

    def _check(self, x):
        if x.shape != (self.batch_size, self.features):
            raise ValueError(
                f"CompiledFlow expects inputs of shape "
                f"{(self.batch_size, self.features)}, got {tuple(x.shape)}"
            )

    def log_prob(self, inputs, context=None):
        self._check(inputs)
        if self.context_features is None:
            return self._log_prob(self._flow, inputs)
        return self._log_prob(self._flow, inputs, context)

    def sample(self, key, context=None):
        if self.context_features is None:
            return self._sample(self._flow, key)
        return self._sample(self._flow, key, context)

    def sample_and_log_prob(self, key, context=None) -> Tuple:
        if self.context_features is None:
            return self._sample_and_log_prob(self._flow, key)
        return self._sample_and_log_prob(self._flow, key, context)
