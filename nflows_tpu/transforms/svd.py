"""SVD-parameterized linear transform (reference: nflows/transforms/svd.py:11-127).

W = U·diag(s)·Vᵀ with U, Vᵀ Householder products and s softplus-positive:
O(KDN) apply with no dense matmul at all, O(D) logdet.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.transforms.linear import Linear
from nflows_tpu.transforms.orthogonal import HouseholderSequence

__all__ = ["SVDLinear"]


class SVDLinear(Linear):
    """Linear module using the SVD for the weight matrix."""

    orthogonal_1: HouseholderSequence
    unconstrained_diagonal: jnp.ndarray
    orthogonal_2: HouseholderSequence
    eps: float = static()

    def __init__(self, features, num_householder, using_cache=False,
                 identity_init=True, eps=1e-3, key=None):
        super().__init__(features, using_cache)
        assert num_householder % 2 == 0
        self.eps = eps
        self.orthogonal_1 = HouseholderSequence(
            features=features, num_transforms=num_householder)
        self.orthogonal_2 = HouseholderSequence(
            features=features, num_transforms=num_householder)
        if identity_init:
            constant = float(np.log(np.exp(1 - eps) - 1))
            self.unconstrained_diagonal = constant * jnp.ones(features)
        else:
            from nflows_tpu.nn.primitives import ensure_key
            key = ensure_key(key)
            stdv = 1.0 / np.sqrt(features)
            self.unconstrained_diagonal = jax.random.uniform(
                key, (features,), minval=-stdv, maxval=stdv)

    @property
    def diagonal(self):
        return self.eps + jnp.logaddexp(self.unconstrained_diagonal, 0.0)

    @property
    def log_diagonal(self):
        return jnp.log(self.diagonal)

    def forward_no_cache(self, inputs):
        outputs, _ = self.orthogonal_2.forward(inputs)
        outputs = outputs * self.diagonal
        outputs, _ = self.orthogonal_1.forward(outputs)
        outputs = outputs + self.bias
        logabsdet = self.logabsdet() * jnp.ones(inputs.shape[0], dtype=inputs.dtype)
        return outputs, logabsdet

    def inverse_no_cache(self, inputs):
        outputs = inputs - self.bias
        outputs, _ = self.orthogonal_1.inverse(outputs)
        outputs = outputs / self.diagonal
        outputs, _ = self.orthogonal_2.inverse(outputs)
        logabsdet = -self.logabsdet() * jnp.ones(inputs.shape[0], dtype=inputs.dtype)
        return outputs, logabsdet

    def weight(self):
        diagonal = jnp.diag(self.diagonal)
        weight, _ = self.orthogonal_2.inverse(diagonal)
        weight, _ = self.orthogonal_1.forward(weight.T)
        return weight.T

    def weight_inverse(self):
        diagonal_inv = jnp.diag(1.0 / self.diagonal)
        weight_inv, _ = self.orthogonal_1.forward(diagonal_inv)
        weight_inv, _ = self.orthogonal_2.inverse(weight_inv.T)
        return weight_inv.T

    def logabsdet(self):
        return jnp.sum(self.log_diagonal)
