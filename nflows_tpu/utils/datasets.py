"""Tiny in-repo datasets for examples/benchmarks (no sklearn dependency).

The two-moons generator mirrors sklearn.datasets.make_moons, which the
reference's examples/moons.ipynb uses as its training data.
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_moons"]


def make_moons(n_samples: int, noise: float = 0.1, rng=None):
    """Two interleaving half-circles. Returns (X [n,2], y [n] in {0,1})."""
    if rng is None:
        rng = np.random.default_rng()
    n_out = n_samples // 2
    n_in = n_samples - n_out
    theta_out = np.pi * rng.uniform(0, 1, n_out)
    theta_in = np.pi * rng.uniform(0, 1, n_in)
    outer = np.stack([np.cos(theta_out), np.sin(theta_out)], axis=1)
    inner = np.stack([1 - np.cos(theta_in), 1 - np.sin(theta_in) - 0.5], axis=1)
    X = np.concatenate([outer, inner], axis=0).astype(np.float32)
    y = np.concatenate([np.zeros(n_out), np.ones(n_in)]).astype(np.int32)
    if noise:
        X = X + rng.normal(scale=noise, size=X.shape).astype(np.float32)
    perm = rng.permutation(n_samples)
    return X[perm], y[perm]
