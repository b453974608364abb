"""LU-parameterized linear transform (reference: nflows/transforms/lu.py:10-129).

W = L·U with unit-lower-triangular L and softplus-positive U diagonal:
guaranteed invertible, O(D²) apply, O(D) logdet, triangular solves for the
inverse. The flat triangular parameter vectors scatter into dense matrices
at trace time (a static scatter XLA folds into the surrounding matmul).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.transforms.linear import Linear

__all__ = ["LULinear"]


class LULinear(Linear):
    """Linear transform parameterizing the LU decomposition of W."""

    lower_entries: jnp.ndarray
    upper_entries: jnp.ndarray
    unconstrained_upper_diag: jnp.ndarray
    eps: float = static()

    def __init__(self, features, using_cache=False, identity_init=True, eps=1e-3,
                 key=None):
        super().__init__(features, using_cache)
        self.eps = eps

        n_triangular_entries = ((features - 1) * features) // 2
        if identity_init:
            self.lower_entries = jnp.zeros(n_triangular_entries)
            self.upper_entries = jnp.zeros(n_triangular_entries)
            constant = float(np.log(np.exp(1 - eps) - 1))
            self.unconstrained_upper_diag = constant * jnp.ones(features)
        else:
            from nflows_tpu.nn.primitives import ensure_key
            key = ensure_key(key)
            k1, k2, k3 = jax.random.split(key, 3)
            stdv = 1.0 / np.sqrt(features)
            self.lower_entries = jax.random.uniform(
                k1, (n_triangular_entries,), minval=-stdv, maxval=stdv)
            self.upper_entries = jax.random.uniform(
                k2, (n_triangular_entries,), minval=-stdv, maxval=stdv)
            self.unconstrained_upper_diag = jax.random.uniform(
                k3, (features,), minval=-stdv, maxval=stdv)

    def _create_lower_upper(self):
        D = self.features
        li = np.tril_indices(D, k=-1)
        ui = np.triu_indices(D, k=1)
        lower = jnp.zeros((D, D), dtype=self.lower_entries.dtype)
        lower = lower.at[li].set(self.lower_entries)
        lower = lower + jnp.eye(D, dtype=lower.dtype)
        upper = jnp.zeros((D, D), dtype=self.upper_entries.dtype)
        upper = upper.at[ui].set(self.upper_entries)
        upper = upper + jnp.diag(self.upper_diag)
        return lower, upper

    @property
    def upper_diag(self):
        return jnp.logaddexp(self.unconstrained_upper_diag, 0.0) + self.eps

    def forward_no_cache(self, inputs):
        lower, upper = self._create_lower_upper()
        outputs = inputs @ upper.T
        outputs = outputs @ lower.T + self.bias
        logabsdet = self.logabsdet() * jnp.ones(
            inputs.shape[0], dtype=inputs.dtype
        )
        return outputs, logabsdet

    def inverse_no_cache(self, inputs):
        lower, upper = self._create_lower_upper()
        outputs = (inputs - self.bias).T
        outputs = jax.scipy.linalg.solve_triangular(
            lower, outputs, lower=True, unit_diagonal=True
        )
        outputs = jax.scipy.linalg.solve_triangular(
            upper, outputs, lower=False, unit_diagonal=False
        )
        outputs = outputs.T
        logabsdet = -self.logabsdet() * jnp.ones(
            inputs.shape[0], dtype=inputs.dtype
        )
        return outputs, logabsdet

    def weight(self):
        lower, upper = self._create_lower_upper()
        return lower @ upper

    def weight_inverse(self):
        lower, upper = self._create_lower_upper()
        identity = jnp.eye(self.features)
        lower_inverse = jax.scipy.linalg.solve_triangular(
            lower, identity, lower=True, unit_diagonal=True
        )
        return jax.scipy.linalg.solve_triangular(
            upper, lower_inverse, lower=False, unit_diagonal=False
        )

    def logabsdet(self):
        return jnp.sum(jnp.log(self.upper_diag))
