"""Inverse Autoregressive Flow prebuilt.

IAF = MAF with forward/inverse swapped (Kingma et al. 2016): one MADE pass
to *sample* (fast generation), D sequential passes for log_prob. The
reference provides only the ``InverseTransform`` combinator for this; here
it is packaged as a model for the common fast-sampling deployment case.
"""

from __future__ import annotations

import jax
import numpy as np

from nflows_tpu.distributions.normal import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.nn.primitives import ensure_key
from nflows_tpu.transforms.autoregressive import MaskedAffineAutoregressiveTransform
from nflows_tpu.transforms.base import CompositeTransform, InverseTransform
from nflows_tpu.transforms.normalization import BatchNorm
from nflows_tpu.transforms.permutations import RandomPermutation, ReversePermutation

__all__ = ["InverseAutoregressiveFlow"]


class InverseAutoregressiveFlow(Flow):
    """[permutation, inverse(MAF-affine)] x num_layers, StandardNormal base."""

    def __init__(self, features, hidden_features, num_layers,
                 num_blocks_per_layer, use_residual_blocks=True,
                 use_random_masks=False, use_random_permutations=False,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 batch_norm_within_layers=False, rng=None):
        key = ensure_key(key)
        keys = jax.random.split(key, num_layers)
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
            layers.append(InverseTransform(MaskedAffineAutoregressiveTransform(
                features=features,
                hidden_features=hidden_features,
                num_blocks=num_blocks_per_layer,
                use_residual_blocks=use_residual_blocks,
                random_mask=use_random_masks,
                key=keys[i],
                activation=activation,
                dropout_probability=dropout_probability,
                use_batch_norm=batch_norm_within_layers,
            )))

        super().__init__(
            transform=CompositeTransform(layers),
            distribution=StandardNormal([features]),
        )
