"""Permutation transforms (reference: nflows/transforms/permutations.py:9-63).

Permutation indices are int32 buffers (non-trainable pytree leaves) so they
checkpoint/round-trip with the model. logabsdet is identically zero.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nflows_tpu.core.module import buffer, static
from nflows_tpu.transforms.base import Transform
import nflows_tpu.utils.typechecks as check

__all__ = ["Permutation", "RandomPermutation", "ReversePermutation"]


class Permutation(Transform):
    """Permutes inputs along a given dim using a fixed permutation."""

    permutation: jnp.ndarray = buffer()
    dim: int = static()

    def __init__(self, permutation, dim: int = 1):
        permutation = jnp.asarray(permutation)
        if permutation.ndim != 1:
            raise ValueError("Permutation must be a 1D tensor.")
        if not check.is_positive_int(dim):
            raise ValueError("dim must be a positive integer.")
        self.permutation = permutation.astype(jnp.int32)
        self.dim = dim

    @property
    def inverse_permutation(self):
        return jnp.argsort(self.permutation)

    @staticmethod
    def _permute(inputs, permutation, dim):
        if dim >= inputs.ndim:
            raise ValueError(f"No dimension {dim} in inputs.")
        if inputs.shape[dim] != permutation.shape[0]:
            raise ValueError(
                f"Dimension {dim} in inputs must be of size {permutation.shape[0]}."
            )
        batch_size = inputs.shape[0]
        outputs = jnp.take(inputs, permutation, axis=dim)
        logabsdet = jnp.zeros(batch_size, dtype=inputs.dtype)
        return outputs, logabsdet

    def forward(self, inputs, context=None):
        return self._permute(inputs, self.permutation, self.dim)

    def inverse(self, inputs, context=None):
        return self._permute(inputs, self.inverse_permutation, self.dim)


class RandomPermutation(Permutation):
    """A random but fixed permutation. Only works with 1D inputs."""

    def __init__(self, features: int, dim: int = 1, rng=None):
        if not check.is_positive_int(features):
            raise ValueError("Number of features must be a positive integer.")
        if rng is None:
            rng = np.random.default_rng()
        super().__init__(jnp.asarray(rng.permutation(features)), dim)


class ReversePermutation(Permutation):
    """Reverses the elements of the input. Only works with 1D inputs."""

    def __init__(self, features: int, dim: int = 1):
        if not check.is_positive_int(features):
            raise ValueError("Number of features must be a positive integer.")
        super().__init__(jnp.arange(features - 1, -1, -1), dim)
