"""Prebuilt simplified RealNVP (reference: nflows/flows/realnvp.py:17-71).

Alternating-checkerboard affine (or additive) coupling layers with
ResidualNet conditioners, optional flow-level BatchNorm, StandardNormal base.
"""

from __future__ import annotations

import jax
import numpy as np

from nflows_tpu.distributions.normal import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.nn import nets
from nflows_tpu.nn.primitives import ensure_key
from nflows_tpu.transforms.base import CompositeTransform
from nflows_tpu.transforms.coupling import (
    AdditiveCouplingTransform,
    AffineCouplingTransform,
)
from nflows_tpu.transforms.normalization import BatchNorm

__all__ = ["SimpleRealNVP"]


class SimpleRealNVP(Flow):
    """RealNVP for 1-dim inputs: 1-dim checkerboard masking, no multiscale."""

    def __init__(self, features, hidden_features, num_layers,
                 num_blocks_per_layer, use_volume_preserving=False,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 batch_norm_within_layers=False, batch_norm_between_layers=False):
        key = ensure_key(key)
        keys = jax.random.split(key, num_layers)

        coupling_constructor = (
            AdditiveCouplingTransform if use_volume_preserving
            else AffineCouplingTransform
        )

        mask = np.ones(features, dtype=np.float32)
        mask[::2] = -1

        layers = []
        for i in range(num_layers):
            layer_key = keys[i]

            def create_resnet(in_features, out_features, _k=layer_key):
                return nets.ResidualNet(
                    in_features, out_features,
                    hidden_features=hidden_features,
                    num_blocks=num_blocks_per_layer,
                    key=_k,
                    activation=activation,
                    dropout_probability=dropout_probability,
                    use_batch_norm=batch_norm_within_layers,
                )

            layers.append(coupling_constructor(
                mask=mask, transform_net_create_fn=create_resnet
            ))
            mask = mask * -1
            if batch_norm_between_layers:
                layers.append(BatchNorm(features=features))

        super().__init__(
            transform=CompositeTransform(layers),
            distribution=StandardNormal([features]),
        )
