"""Plain MLP with shape checking (reference: nflows/nn/nets/mlp.py:9-68)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import Module, static
from nflows_tpu.nn.primitives import Dense, ensure_key

__all__ = ["MLP"]


class MLP(Module):
    """A standard multi-layer perceptron over flattened inputs."""

    input_layer: Dense
    hidden_layers: tuple
    output_layer: Dense
    in_shape: tuple = static()
    out_shape: tuple = static()
    activation: object = static()
    activate_output: bool = static()

    def __init__(self, in_shape, out_shape, hidden_sizes, key=None,
                 activation=jax.nn.relu, activate_output: bool = False):
        if len(hidden_sizes) == 0:
            raise ValueError("List of hidden sizes can't be empty.")
        key = ensure_key(key)
        keys = jax.random.split(key, len(hidden_sizes) + 1)
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(out_shape)
        self.activation = activation
        self.activate_output = activate_output
        self.input_layer = Dense(int(np.prod(in_shape)), hidden_sizes[0], key=keys[0])
        self.hidden_layers = tuple(
            Dense(in_size, out_size, key=k)
            for in_size, out_size, k in zip(hidden_sizes[:-1], hidden_sizes[1:], keys[1:-1])
        )
        self.output_layer = Dense(hidden_sizes[-1], int(np.prod(out_shape)), key=keys[-1])

    def __call__(self, inputs):
        if tuple(inputs.shape[1:]) != self.in_shape:
            raise ValueError(
                f"Expected inputs of shape {self.in_shape}, got {tuple(inputs.shape[1:])}."
            )
        outputs = inputs.reshape(-1, int(np.prod(self.in_shape)))
        outputs = self.activation(self.input_layer(outputs))
        for layer in self.hidden_layers:
            outputs = self.activation(layer(outputs))
        outputs = self.output_layer(outputs)
        if self.activate_output:
            outputs = self.activation(outputs)
        return outputs.reshape(-1, *self.out_shape)
