"""Autoregressive Neural Spline Flow prebuilt (RQ-NSF (AR)).

The NSF paper's autoregressive variant (Durkan et al. 2019, Table 1
"RQ-NSF (AR)"): stack of [permutation, RQ-spline masked-autoregressive
transform]. One MADE pass per layer for log_prob/training (fully parallel
over features); sampling costs D sequential passes per layer, compiled as
one XLA while-loop (transforms/autoregressive.py). The reference ships the
transform (nflows/transforms/autoregressive.py:404-495) but no packaged
model; this mirrors :class:`~nflows_tpu.models.NeuralSplineFlow`'s
constructor so the two variants are interchangeable.
"""

from __future__ import annotations

import jax
import numpy as np

from nflows_tpu.distributions.normal import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.nn.primitives import ensure_key
from nflows_tpu.transforms.autoregressive import (
    MaskedPiecewiseRationalQuadraticAutoregressiveTransform,
)
from nflows_tpu.transforms.base import CompositeTransform
from nflows_tpu.transforms.lu import LULinear
from nflows_tpu.transforms.permutations import RandomPermutation, ReversePermutation

__all__ = ["NeuralSplineFlowAR"]


class NeuralSplineFlowAR(Flow):
    """RQ-NSF (autoregressive) for tabular data."""

    def __init__(self, features, hidden_features, num_layers=10,
                 num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
                 context_features=None, use_random_permutations=True,
                 use_linear_layers=False,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 batch_norm_within_layers=False, rng=None):
        """``use_linear_layers=True`` interleaves invertible LU-decomposed
        linear layers after each permutation — the NSF paper's AR
        configuration for the UCI runs (arXiv:1906.04032 §3.2)."""
        key = ensure_key(key)
        keys = jax.random.split(key, 2 * num_layers)
        if rng is None:
            # derive permutation/1x1-conv randomness from `key` so
            # different keys give different permutations, reproducibly
            rng = np.random.default_rng(
                np.asarray(jax.random.key_data(key)).ravel())

        layers = []
        for i in range(num_layers):
            if use_random_permutations:
                layers.append(RandomPermutation(features, rng=rng))
            else:
                layers.append(ReversePermutation(features))
            if use_linear_layers:
                layers.append(LULinear(features, identity_init=True,
                                       key=keys[num_layers + i]))
            layers.append(MaskedPiecewiseRationalQuadraticAutoregressiveTransform(
                features=features,
                hidden_features=hidden_features,
                context_features=context_features,
                num_bins=num_bins,
                tails="linear",
                tail_bound=tail_bound,
                num_blocks=num_blocks_per_layer,
                key=keys[i],
                activation=activation,
                dropout_probability=dropout_probability,
                use_batch_norm=batch_norm_within_layers,
            ))

        super().__init__(
            transform=CompositeTransform(layers),
            distribution=StandardNormal([features]),
        )
