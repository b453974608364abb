"""Invertible linear transforms: abstract base + NaiveLinear
(reference: nflows/transforms/linear.py).

The reference keeps an eval-mode mutable cache of (weight, inverse,
logabsdet) invalidated by ``.train()`` (linear.py:14-96). Mutation doesn't
exist here; the TPU-native analogue is an explicit ``precompute()`` step
that returns a copy with the derived arrays baked in as buffers — compute
the O(D³) factorization once, then every jitted sample/log_prob call reuses
the baked arrays (they ride along as ordinary pytree leaves).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import buffer, static
from nflows_tpu.transforms.base import Transform
from nflows_tpu.utils import linalg
import nflows_tpu.utils.typechecks as check

__all__ = ["Linear", "NaiveLinear", "precompute_linear_caches"]


class Linear(Transform):
    """Abstract base for transforms y = W x + b with parameterized W.

    Subclasses implement ``forward_no_cache`` / ``inverse_no_cache`` /
    ``weight`` / ``weight_inverse`` / ``logabsdet``. ``weight()`` follows the
    torch convention: W[i, j] is the coefficient of input j in output i, so
    application is ``x @ W.T + b``.
    """

    bias: jnp.ndarray
    cache_weight: Optional[jnp.ndarray] = buffer(default=None)
    cache_inverse: Optional[jnp.ndarray] = buffer(default=None)
    cache_logabsdet: Optional[jnp.ndarray] = buffer(default=None)
    features: int = static()
    using_cache: bool = static()

    def __init__(self, features, using_cache=False):
        if not check.is_positive_int(features):
            raise TypeError("Number of features must be a positive integer.")
        self.features = features
        self.bias = jnp.zeros(features)
        self.using_cache = using_cache
        self.cache_weight = None
        self.cache_inverse = None
        self.cache_logabsdet = None

    # -- cache management (functional analogue of reference linear.py:87-96) --

    def precompute(self) -> "Linear":
        """Bake (weight, inverse, logabsdet) into buffers for fast repeated
        eval — the analogue of the reference's eval-mode cache fill."""
        # weight_inverse_and_logabsdet shares one factorization where the
        # subclass provides it (NaiveLinear's LU), vs paying slogdet + inv
        inverse, logabsdet = self.weight_inverse_and_logabsdet()
        weight = self.weight()
        return self.replace(
            cache_weight=weight,
            cache_inverse=inverse,
            cache_logabsdet=logabsdet,
            using_cache=True,
        )

    def invalidate_cache(self) -> "Linear":
        """Drop baked arrays (the analogue of .train() invalidation)."""
        return self.replace(
            cache_weight=None, cache_inverse=None, cache_logabsdet=None,
            using_cache=False,
        )

    def forward(self, inputs, context=None):
        if self.using_cache and self.cache_weight is not None:
            # 'highest' precision: the cache exists for numerical parity
            # with the solve path, and these [N, D] x [D, D] GEMMs are
            # negligible next to conditioner convs/matmuls
            outputs = jnp.dot(inputs, self.cache_weight.T,
                              precision=jax.lax.Precision.HIGHEST) + self.bias
            logabsdet = self.cache_logabsdet * jnp.ones(
                inputs.shape[0], dtype=inputs.dtype
            )
            return outputs, logabsdet
        return self.forward_no_cache(inputs)

    def inverse(self, inputs, context=None):
        if self.using_cache and self.cache_inverse is not None:
            outputs = jnp.dot(inputs - self.bias, self.cache_inverse.T,
                              precision=jax.lax.Precision.HIGHEST)
            logabsdet = -self.cache_logabsdet * jnp.ones(
                inputs.shape[0], dtype=inputs.dtype
            )
            return outputs, logabsdet
        return self.inverse_no_cache(inputs)

    def weight_and_logabsdet(self):
        return self.weight(), self.logabsdet()

    def weight_inverse_and_logabsdet(self):
        return self.weight_inverse(), self.logabsdet()

    def forward_no_cache(self, inputs):
        raise NotImplementedError()

    def inverse_no_cache(self, inputs):
        raise NotImplementedError()

    def weight(self):
        raise NotImplementedError()

    def weight_inverse(self):
        raise NotImplementedError()

    def logabsdet(self):
        raise NotImplementedError()


class NaiveLinear(Linear):
    """Unconstrained weight matrix: O(D³) slogdet forward, LU solve inverse
    (reference linear.py:129-229)."""

    weight_param: jnp.ndarray

    def __init__(self, features, orthogonal_initialization=True, using_cache=False,
                 key=None):
        super().__init__(features, using_cache)
        from nflows_tpu.nn.primitives import ensure_key
        key = ensure_key(key)
        if orthogonal_initialization:
            self.weight_param = linalg.random_orthogonal(features, key=key)
        else:
            stdv = 1.0 / np.sqrt(features)
            self.weight_param = jax.random.uniform(
                key, (features, features), minval=-stdv, maxval=stdv
            )

    def forward_no_cache(self, inputs):
        batch_size = inputs.shape[0]
        outputs = inputs @ self.weight_param.T + self.bias
        logabsdet = linalg.logabsdet(self.weight_param)
        return outputs, logabsdet * jnp.ones(batch_size, dtype=inputs.dtype)

    def inverse_no_cache(self, inputs):
        batch_size = inputs.shape[0]
        outputs = inputs - self.bias
        lu, piv = jax.scipy.linalg.lu_factor(self.weight_param)
        outputs = jax.scipy.linalg.lu_solve((lu, piv), outputs.T).T
        logabsdet = -jnp.sum(jnp.log(jnp.abs(jnp.diagonal(lu))))
        return outputs, logabsdet * jnp.ones(batch_size, dtype=inputs.dtype)

    def weight(self):
        return self.weight_param

    def weight_inverse(self):
        return jnp.linalg.inv(self.weight_param)

    def weight_inverse_and_logabsdet(self):
        lu, piv = jax.scipy.linalg.lu_factor(self.weight_param)
        identity = jnp.eye(self.features)
        weight_inv = jax.scipy.linalg.lu_solve((lu, piv), identity)
        logabsdet = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(lu))))
        return weight_inv, logabsdet

    def logabsdet(self):
        return linalg.logabsdet(self.weight_param)


def precompute_linear_caches(tree):
    """Walk a flow/transform pytree and ``precompute()`` every
    :class:`Linear` in it — one-shot inverse/logdet baking for serving
    (the flow-level analogue of the reference putting a model in eval mode
    so per-layer caches fill, linear.py:87-96). Returns the new tree."""
    from nflows_tpu.core.module import Module

    def walk(x):
        if isinstance(x, Linear):
            return x.precompute()
        if isinstance(x, Module):
            return x.replace(**{
                f: walk(getattr(x, f)) for f in type(x)._child_fields
            })
        if isinstance(x, (tuple, list)):
            items = [walk(v) for v in x]
            if hasattr(type(x), "_fields"):  # NamedTuple (optax states)
                return type(x)(*items)
            return type(x)(items)
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items()}
        return x

    return walk(tree)
