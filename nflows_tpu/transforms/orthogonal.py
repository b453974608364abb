"""Orthogonal transform as a Householder product
(reference: nflows/transforms/orthogonal.py:10-110).

K reflections applied sequentially — here a ``lax.scan`` over the q-vector
stack, so the compiled program is one fused loop (rank-1 update per step,
pure VPU work) regardless of K. logabsdet is identically 0; the inverse is
the same reflections in reverse order.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.transforms.base import Transform
import nflows_tpu.utils.typechecks as check

__all__ = ["HouseholderSequence"]


def _eye_tiled_init(num_transforms: int, features: int) -> np.ndarray:
    """Reference init: rows of eye(K//2, F) each repeated twice, plus a
    standard-basis row when K is odd (orthogonal.py:40-57). Pairs of equal
    reflections compose to the identity, so the initial map is I."""
    qv = np.repeat(np.eye(num_transforms // 2, features, dtype=np.float32), 2, axis=0)
    if num_transforms % 2 != 0:
        extra = np.zeros((1, features), dtype=np.float32)
        extra[0, num_transforms // 2] = 1.0
        qv = np.concatenate([qv, extra], axis=0)
    return qv


class HouseholderSequence(Transform):
    """Sequence of Householder reflections parameterizing an orthogonal map."""

    q_vectors: jnp.ndarray
    features: int = static()
    num_transforms: int = static()

    def __init__(self, features, num_transforms):
        if not check.is_positive_int(features):
            raise TypeError("Number of features must be a positive integer.")
        if not check.is_positive_int(num_transforms):
            raise TypeError("Number of transforms must be a positive integer.")
        self.features = features
        self.num_transforms = num_transforms
        self.q_vectors = jnp.asarray(_eye_tiled_init(num_transforms, features))

    @staticmethod
    def _apply_transforms(inputs, q_vectors):
        """O(KDN): sequential rank-1 reflections via lax.scan."""
        squared_norms = jnp.sum(q_vectors ** 2, axis=-1)

        def body(outputs, qv_and_norm):
            q_vector, squared_norm = qv_and_norm
            temp = outputs @ q_vector
            outputs = outputs - jnp.outer(temp, (2.0 / squared_norm) * q_vector)
            return outputs, None

        outputs, _ = jax.lax.scan(body, inputs, (q_vectors, squared_norms))
        logabsdet = jnp.zeros(inputs.shape[0], dtype=inputs.dtype)
        return outputs, logabsdet

    def forward(self, inputs, context=None):
        return self._apply_transforms(inputs, self.q_vectors)

    def inverse(self, inputs, context=None):
        # Each reflection is its own inverse; apply in reverse order.
        return self._apply_transforms(inputs, self.q_vectors[::-1])

    def matrix(self):
        """Dense [D, D] matrix of the total transform (orthogonal.py:99-110)."""
        identity = jnp.eye(self.features)
        outputs, _ = self.inverse(identity)
        return outputs
