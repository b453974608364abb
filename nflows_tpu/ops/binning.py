"""Bin-lookup primitives shared by every spline kernel.

TPU-native design notes: the reference indexes bins with ``searchsorted`` +
``gather`` on the last axis (reference nflows/utils/torchutils.py:134-136 and
splines/*.py). On TPU, for the small bin counts flows use (K ≈ 8–32), a
gather along a tiny trailing axis lowers poorly; instead we build the bin
indicator once as a one-hot mask — a K-wide compare — and select every bin
parameter with a multiply-reduce over K. All of these fuse into one VPU loop
nest with the surrounding softmax/cumsum; nothing round-trips to HBM.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["bin_onehot", "select_bin", "normalize_bins", "pad_zero_left"]


def bin_onehot(bin_edges: jnp.ndarray, inputs: jnp.ndarray, eps: float = 1e-6
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-hot indicator of the bin containing each input.

    Args:
        bin_edges: [..., K+1] monotone bin edges.
        inputs:    [...] query points (should lie within [edges[0], edges[-1]];
            out-of-range points clamp to the first/last bin).
        eps: nudge on the top edge so inputs == right boundary land in the
            last bin (same convention as reference torchutils.searchsorted).

    Returns:
        (onehot [..., K] in inputs.dtype, idx [...] int32)
    """
    num_bins = bin_edges.shape[-1] - 1
    edges = bin_edges.at[..., -1].add(eps)
    ge = inputs[..., None] >= edges
    idx = jnp.clip(jnp.sum(ge, axis=-1) - 1, 0, num_bins - 1).astype(jnp.int32)
    onehot = (idx[..., None] == jnp.arange(num_bins)).astype(inputs.dtype)
    return onehot, idx


def select_bin(params: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Select per-element bin parameter: sum(params * onehot, -1).

    ``params`` is [..., K]; ``onehot`` is [..., K]; result is [...].
    """
    return jnp.sum(params * onehot, axis=-1)


def normalize_bins(unnormalized: jnp.ndarray, num_bins: int, min_size: float
                   ) -> jnp.ndarray:
    """softmax + minimum-size floor (reference splines/*.py bin normalization)."""
    w = jnp.exp(unnormalized - jnp.max(unnormalized, axis=-1, keepdims=True))
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return min_size + (1.0 - min_size * num_bins) * w


def pad_zero_left(x: jnp.ndarray) -> jnp.ndarray:
    """Prepend a zero along the last axis (F.pad(..., (1,0)) equivalent)."""
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(1, 0)]
    return jnp.pad(x, pad_widths)
