"""Binary-mask builders for coupling layers (reference: nflows/utils/torchutils.py:59-100).

Masks are host-side numpy construction (model build time, never traced), then
stored as non-trainable buffers on the transforms.
"""

from __future__ import annotations

import numpy as np

from nflows_tpu.utils import typechecks as check

__all__ = [
    "create_alternating_binary_mask",
    "create_mid_split_binary_mask",
    "create_random_binary_mask",
]


def create_alternating_binary_mask(features: int, even: bool = True) -> np.ndarray:
    """Checkerboard mask: 1s on even (or odd) indices (torchutils.py:59-70)."""
    if not check.is_positive_int(features):
        raise TypeError("Number of features must be a positive integer.")
    mask = np.zeros(features, dtype=np.float32)
    start = 0 if even else 1
    mask[start::2] = 1.0
    return mask


def create_mid_split_binary_mask(features: int) -> np.ndarray:
    """First ceil(features/2) entries are 1 (torchutils.py:73-82)."""
    if not check.is_positive_int(features):
        raise TypeError("Number of features must be a positive integer.")
    mask = np.zeros(features, dtype=np.float32)
    midpoint = features // 2 if features % 2 == 0 else features // 2 + 1
    mask[:midpoint] = 1.0
    return mask


def create_random_binary_mask(features: int, rng: "np.random.Generator" = None) -> np.ndarray:
    """Exactly ceil(features/2) randomly-placed 1s (torchutils.py:85-100)."""
    if not check.is_positive_int(features):
        raise TypeError("Number of features must be a positive integer.")
    if rng is None:
        rng = np.random.default_rng()
    mask = np.zeros(features, dtype=np.float32)
    num_ones = features // 2 if features % 2 == 0 else features // 2 + 1
    indices = rng.permutation(features)[:num_ones]
    mask[indices] = 1.0
    return mask
