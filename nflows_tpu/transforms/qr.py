"""QR-parameterized linear transform (reference: nflows/transforms/qr.py:11-114).

W = Q·R with Q a Householder product and R upper-triangular with exp
diagonal (always invertible). O(D²N + KDN) apply, O(D) logdet.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.transforms.linear import Linear
from nflows_tpu.transforms.orthogonal import HouseholderSequence

__all__ = ["QRLinear"]


class QRLinear(Linear):
    """Linear module using the QR decomposition for the weight matrix."""

    upper_entries: jnp.ndarray
    log_upper_diag: jnp.ndarray
    orthogonal: HouseholderSequence

    def __init__(self, features, num_householder, using_cache=False, key=None):
        super().__init__(features, using_cache)
        from nflows_tpu.nn.primitives import ensure_key
        key = ensure_key(key)
        k1, k2 = jax.random.split(key)
        n_triangular_entries = ((features - 1) * features) // 2
        stdv = 1.0 / np.sqrt(features)
        self.upper_entries = jax.random.uniform(
            k1, (n_triangular_entries,), minval=-stdv, maxval=stdv)
        self.log_upper_diag = jax.random.uniform(
            k2, (features,), minval=-stdv, maxval=stdv)
        self.orthogonal = HouseholderSequence(
            features=features, num_transforms=num_householder)

    def _create_upper(self):
        D = self.features
        ui = np.triu_indices(D, k=1)
        upper = jnp.zeros((D, D), dtype=self.upper_entries.dtype)
        upper = upper.at[ui].set(self.upper_entries)
        return upper + jnp.diag(jnp.exp(self.log_upper_diag))

    def forward_no_cache(self, inputs):
        upper = self._create_upper()
        outputs = inputs @ upper.T
        outputs, _ = self.orthogonal.forward(outputs)  # logabsdet is zero
        outputs = outputs + self.bias
        logabsdet = self.logabsdet() * jnp.ones(inputs.shape[0], dtype=inputs.dtype)
        return outputs, logabsdet

    def inverse_no_cache(self, inputs):
        upper = self._create_upper()
        outputs = inputs - self.bias
        outputs, _ = self.orthogonal.inverse(outputs)
        outputs = jax.scipy.linalg.solve_triangular(upper, outputs.T, lower=False).T
        logabsdet = -self.logabsdet() * jnp.ones(inputs.shape[0], dtype=inputs.dtype)
        return outputs, logabsdet

    def weight(self):
        upper = self._create_upper()
        weight, _ = self.orthogonal.forward(upper.T)
        return weight.T

    def weight_inverse(self):
        upper = self._create_upper()
        identity = jnp.eye(self.features)
        upper_inv = jax.scipy.linalg.solve_triangular(upper, identity, lower=False)
        weight_inv, _ = self.orthogonal.forward(upper_inv)
        return weight_inv

    def logabsdet(self):
        return jnp.sum(self.log_upper_diag)
