"""Prebuilt Masked Autoregressive Flow
(reference: nflows/flows/autoregressive.py:13-62).

[permutation, MAF-affine] x num_layers (+optional BatchNorm between layers),
StandardNormal base.
"""

from __future__ import annotations

import jax
import numpy as np

from nflows_tpu.distributions.normal import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.nn.primitives import ensure_key
from nflows_tpu.transforms.autoregressive import MaskedAffineAutoregressiveTransform
from nflows_tpu.transforms.base import CompositeTransform
from nflows_tpu.transforms.normalization import BatchNorm
from nflows_tpu.transforms.permutations import RandomPermutation, ReversePermutation

__all__ = ["MaskedAutoregressiveFlow"]


class MaskedAutoregressiveFlow(Flow):
    """MAF (Papamakarios et al., NeurIPS 2017)."""

    def __init__(self, features, hidden_features, num_layers,
                 num_blocks_per_layer, use_residual_blocks=True,
                 use_random_masks=False, use_random_permutations=False,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 batch_norm_within_layers=False, batch_norm_between_layers=False,
                 rng=None):
        key = ensure_key(key)
        keys = jax.random.split(key, num_layers)
        if rng is None:
            rng = np.random.default_rng()

        layers = []
        for i in range(num_layers):
            if use_random_permutations:
                layers.append(RandomPermutation(features, rng=rng))
            else:
                layers.append(ReversePermutation(features))
            layers.append(MaskedAffineAutoregressiveTransform(
                features=features,
                hidden_features=hidden_features,
                num_blocks=num_blocks_per_layer,
                use_residual_blocks=use_residual_blocks,
                random_mask=use_random_masks,
                key=keys[i],
                activation=activation,
                dropout_probability=dropout_probability,
                use_batch_norm=batch_norm_within_layers,
            ))
            if batch_norm_between_layers:
                layers.append(BatchNorm(features))

        super().__init__(
            transform=CompositeTransform(layers),
            distribution=StandardNormal([features]),
        )
