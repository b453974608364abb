"""Numerical helpers: searchsorted, logabsdet, orthogonal init, cbrt, KDE.

Reference: nflows/utils/torchutils.py:103-171. ``searchsorted`` here is the
TPU-native bin lookup used by every spline kernel: for the small bin counts
flows use (K <= 32) a sum-of-comparisons over the last axis vectorizes onto
the VPU and fuses with the surrounding softmax/cumsum — no gather needed to
find the bin, and downstream parameter selection uses one-hot contraction
(see nflows_tpu/ops/splines).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "searchsorted",
    "logabsdet",
    "random_orthogonal",
    "cbrt",
    "gaussian_kde_log_eval",
]


def searchsorted(bin_locations: jnp.ndarray, inputs: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Index of the bin containing each input (reference torchutils.py:134-136).

    ``bin_locations`` has shape [..., K+1] (bin edges); returns int32 [...] in
    [0, K-1]. The last edge is nudged by ``eps`` so inputs == right edge land
    in the final bin, exactly matching the reference semantics.
    """
    bin_locations = bin_locations.at[..., -1].add(eps)
    idx = jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1
    return jnp.clip(idx, 0, bin_locations.shape[-1] - 2).astype(jnp.int32)


def logabsdet(x: jnp.ndarray) -> jnp.ndarray:
    """log|det x| via slogdet (reference torchutils.py:103-106)."""
    _, res = jnp.linalg.slogdet(x)
    return res


def random_orthogonal(size: int, key=None) -> jnp.ndarray:
    """Haar-random orthogonal matrix via QR (reference torchutils.py:109-122)."""
    if key is None:
        key = jax.random.key(np.random.default_rng().integers(2**31))
    x = jax.random.normal(key, (size, size))
    q, r = jnp.linalg.qr(x)
    # Sign-correct so the distribution is Haar (reference uses plain QR of
    # a random matrix; we match the decomposition but fix the sign ambiguity).
    d = jnp.sign(jnp.diagonal(r))
    return q * d[None, :]


def cbrt(x: jnp.ndarray) -> jnp.ndarray:
    """Real cube root preserving sign (reference torchutils.py:139-141)."""
    return jnp.sign(x) * jnp.exp(jnp.log(jnp.abs(x)) / 3.0)


def gaussian_kde_log_eval(samples: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Log of a Gaussian KDE at ``query`` (reference torchutils.py:163-171)."""
    N, D = samples.shape[0], samples.shape[-1]
    std = N ** (-1.0 / (D + 4))
    diffs = (query[None, :] - samples) / std
    log_exp = -0.5 * jnp.sum(diffs ** 2, axis=-1)
    log_z = 0.5 * D * jnp.log(2 * jnp.pi) + D * jnp.log(std)
    return jax.scipy.special.logsumexp(log_exp - log_z, axis=0) - jnp.log(N * 1.0)
