"""Residual conditioner networks (reference: nflows/nn/nets/resnet.py).

``ResidualNet`` is the default coupling conditioner; ``ConvResidualNet`` the
image variant. Structure matches the reference: initial layer on
[inputs ‖ context], N pre-activation residual blocks with GLU context
fusion, final projection (resnet.py:9-100 / 103-205). The final block layer
is zero-ish initialized (U(-1e-3, 1e-3)) so coupling transforms start near
identity.

Batch norm uses per-batch statistics with learnable scale/offset when
enabled (``use_batch_norm=True``); running-stats inference mode is handled
at the flow level (transforms/normalization.py), not inside conditioners.
Dropout takes an explicit optional ``key`` (None = eval = identity).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nflows_tpu.core.module import Module, static
from nflows_tpu.nn.primitives import Conv2d, Dense, Dropout, ensure_key, glu

__all__ = ["ResidualBlock", "ResidualNet", "ConvResidualBlock", "ConvResidualNet"]


class _BatchScale(Module):
    """Learnable scale/offset applied after batch-stat normalization.

    ``stats_axis`` (set tree-wide via ``core.module.set_stats_axis``) makes
    the statistics global-batch under an explicit mapped data axis — same
    contract as transforms/normalization.py:BatchNorm."""

    scale: jnp.ndarray
    offset: jnp.ndarray
    eps: float = static()
    stats_axis: object = static()

    def __init__(self, features: int, eps: float = 1e-3, stats_axis=None):
        self.scale = jnp.ones((features,))
        self.offset = jnp.zeros((features,))
        self.eps = eps
        self.stats_axis = stats_axis

    def __call__(self, x, axes):
        mean = jnp.mean(x, axis=axes, keepdims=True)
        if self.stats_axis is None:
            var = jnp.var(x, axis=axes, keepdims=True)
        else:
            mean = jax.lax.pmean(mean, self.stats_axis)
            # two-pass centered global variance (no cancellation; matches
            # jnp.var's numerics), biased like jnp.var's default ddof=0
            centered = x - mean
            var = jax.lax.pmean(
                jnp.mean(centered * centered, axis=axes, keepdims=True),
                self.stats_axis,
            )
        xhat = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if x.ndim == 4:  # NCHW
            return xhat * self.scale[None, :, None, None] + self.offset[None, :, None, None]
        return xhat * self.scale + self.offset


class ResidualBlock(Module):
    """Pre-activation residual block for 1-dim inputs
    (reference resnet.py:9-52)."""

    linear_0: Dense
    linear_1: Dense
    context_layer: Optional[Dense]
    batch_norm_0: Optional[_BatchScale]
    batch_norm_1: Optional[_BatchScale]
    dropout: Dropout
    activation: object = static()

    def __init__(self, features, context_features, key=None,
                 activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False, zero_initialization=True):
        key = ensure_key(key)
        k0, k1, kc = jax.random.split(key, 3)
        self.activation = activation
        self.batch_norm_0 = _BatchScale(features) if use_batch_norm else None
        self.batch_norm_1 = _BatchScale(features) if use_batch_norm else None
        self.context_layer = (
            Dense(context_features, features, key=kc)
            if context_features is not None else None
        )
        self.linear_0 = Dense(features, features, key=k0)
        self.linear_1 = Dense(
            features, features, key=k1,
            w_init_scale=1e-3 if zero_initialization else None,
        )
        self.dropout = Dropout(dropout_probability)

    def __call__(self, inputs, context=None, key=None):
        temps = inputs
        if self.batch_norm_0 is not None:
            temps = self.batch_norm_0(temps, axes=(0,))
        temps = self.activation(temps)
        temps = self.linear_0(temps)
        if self.batch_norm_1 is not None:
            temps = self.batch_norm_1(temps, axes=(0,))
        temps = self.activation(temps)
        temps = self.dropout(temps, key=key)
        temps = self.linear_1(temps)
        if context is not None:
            temps = glu(
                jnp.concatenate([temps, self.context_layer(context)], axis=1), axis=1
            )
        return inputs + temps


class ResidualNet(Module):
    """General-purpose residual conditioner for 1-dim inputs
    (reference resnet.py:55-100)."""

    initial_layer: Dense
    blocks: tuple
    final_layer: Dense
    context_features: object = static()
    hidden_features: int = static()

    def __init__(self, in_features, out_features, hidden_features,
                 context_features=None, num_blocks=2, key=None,
                 activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False):
        key = ensure_key(key)
        keys = jax.random.split(key, num_blocks + 2)
        self.context_features = context_features
        self.hidden_features = hidden_features
        in_total = in_features + (context_features or 0)
        self.initial_layer = Dense(in_total, hidden_features, key=keys[0])
        self.blocks = tuple(
            ResidualBlock(
                features=hidden_features,
                context_features=context_features,
                key=keys[i + 1],
                activation=activation,
                dropout_probability=dropout_probability,
                use_batch_norm=use_batch_norm,
            )
            for i in range(num_blocks)
        )
        self.final_layer = Dense(hidden_features, out_features, key=keys[-1])

    def __call__(self, inputs, context=None, key=None):
        if context is None:
            temps = self.initial_layer(inputs)
        else:
            temps = self.initial_layer(jnp.concatenate([inputs, context], axis=1))
        block_keys = (
            jax.random.split(key, len(self.blocks)) if key is not None
            else [None] * len(self.blocks)
        )
        for block, bkey in zip(self.blocks, block_keys):
            temps = block(temps, context=context, key=bkey)
        return self.final_layer(temps)


class ConvResidualBlock(Module):
    """Pre-activation conv residual block, 3x3 convs, GLU context fusion
    (reference resnet.py:103-151)."""

    conv_0: Conv2d
    conv_1: Conv2d
    context_layer: Optional[Conv2d]
    batch_norm_0: Optional[_BatchScale]
    batch_norm_1: Optional[_BatchScale]
    dropout: Dropout
    activation: object = static()

    def __init__(self, channels, context_channels=None, key=None,
                 activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False, zero_initialization=True,
                 conv_layout="auto"):
        key = ensure_key(key)
        k0, k1, kc = jax.random.split(key, 3)
        self.activation = activation
        self.batch_norm_0 = _BatchScale(channels) if use_batch_norm else None
        self.batch_norm_1 = _BatchScale(channels) if use_batch_norm else None
        self.context_layer = (
            Conv2d(context_channels, channels, kernel_size=1, padding=0,
                   key=kc, layout=conv_layout)
            if context_channels is not None else None
        )
        self.conv_0 = Conv2d(channels, channels, kernel_size=3, padding=1,
                             key=k0, layout=conv_layout)
        self.conv_1 = Conv2d(
            channels, channels, kernel_size=3, padding=1, key=k1,
            w_init_scale=1e-3 if zero_initialization else None,
            layout=conv_layout,
        )
        self.dropout = Dropout(dropout_probability)

    def __call__(self, inputs, context=None, key=None):
        temps = inputs
        if self.batch_norm_0 is not None:
            temps = self.batch_norm_0(temps, axes=(0, 2, 3))
        temps = self.activation(temps)
        temps = self.conv_0(temps)
        if self.batch_norm_1 is not None:
            temps = self.batch_norm_1(temps, axes=(0, 2, 3))
        temps = self.activation(temps)
        temps = self.dropout(temps, key=key)
        temps = self.conv_1(temps)
        if context is not None:
            temps = glu(
                jnp.concatenate([temps, self.context_layer(context)], axis=1), axis=1
            )
        return inputs + temps


class ConvResidualNet(Module):
    """Conv residual conditioner for NCHW image inputs
    (reference resnet.py:154-205)."""

    initial_layer: Conv2d
    blocks: tuple
    final_layer: Conv2d
    context_channels: object = static()
    hidden_channels: int = static()

    def __init__(self, in_channels, out_channels, hidden_channels,
                 context_channels=None, num_blocks=2, key=None,
                 activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False, conv_layout="auto"):
        key = ensure_key(key)
        keys = jax.random.split(key, num_blocks + 2)
        self.context_channels = context_channels
        self.hidden_channels = hidden_channels
        in_total = in_channels + (context_channels or 0)
        self.initial_layer = Conv2d(in_total, hidden_channels, kernel_size=1,
                                    padding=0, key=keys[0],
                                    layout=conv_layout)
        self.blocks = tuple(
            ConvResidualBlock(
                channels=hidden_channels,
                context_channels=context_channels,
                key=keys[i + 1],
                activation=activation,
                dropout_probability=dropout_probability,
                use_batch_norm=use_batch_norm,
                conv_layout=conv_layout,
            )
            for i in range(num_blocks)
        )
        self.final_layer = Conv2d(hidden_channels, out_channels, kernel_size=1,
                                  padding=0, key=keys[-1],
                                  layout=conv_layout)

    def __call__(self, inputs, context=None, key=None):
        if context is None:
            temps = self.initial_layer(inputs)
        else:
            temps = self.initial_layer(jnp.concatenate([inputs, context], axis=1))
        block_keys = (
            jax.random.split(key, len(self.blocks)) if key is not None
            else [None] * len(self.blocks)
        )
        for block, bkey in zip(self.blocks, block_keys):
            temps = block(temps, context=context, key=bkey)
        return self.final_layer(temps)
