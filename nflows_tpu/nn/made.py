"""MADE: masked autoregressive conditioner (reference: nflows/transforms/made.py).

Degree assignment and mask construction happen on the host with numpy at
build time; masks are float buffers baked into the model pytree. The masked
GEMM is ``x @ (W * M)`` — XLA fuses the elementwise mask multiply into the
MXU matmul's operand load, so masking is free at run time.

The autoregressive property (output k depends only on inputs < k) is what
the whole MAF family rests on; tests/transforms/test_made.py reproduces the
reference's jacobian-connectivity and mask-product checks
(reference tests/transforms/made_test.py:77-136).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.core.module import Module, buffer, static
from nflows_tpu.nn.nets.resnet import _BatchScale
from nflows_tpu.nn.primitives import Dense, Dropout, ensure_key

__all__ = ["MaskedDense", "MaskedFeedforwardBlock", "MaskedResidualBlock", "MADE"]


def _get_input_degrees(in_features: int) -> np.ndarray:
    """Degrees 1..D for MADE inputs (reference made.py:12-14)."""
    return np.arange(1, in_features + 1)


def _mask_and_degrees(in_degrees: np.ndarray, out_features: int,
                      autoregressive_features: int, random_mask: bool,
                      is_output: bool, rng=None):
    """Compute the [in, out] binary mask and output degrees
    (reference made.py:42-69; note our mask is transposed vs torch's
    [out, in] because Dense stores W as [in, out])."""
    if is_output:
        base = _get_input_degrees(autoregressive_features)
        reps = out_features // autoregressive_features
        # Each degree repeated `reps` times contiguously, so reshaping the
        # output to [batch, features, multiplier] keeps feature k's params at
        # [:, k, :] (reference torchutils.tile semantics, torchutils.py:8-16).
        out_degrees = np.repeat(base, reps)
        mask = (out_degrees[None, :] > in_degrees[:, None]).astype(np.float32)
    else:
        if random_mask:
            if rng is None:
                rng = np.random.default_rng()
            min_in_degree = min(int(np.min(in_degrees)), autoregressive_features - 1)
            out_degrees = rng.integers(
                low=min_in_degree, high=autoregressive_features, size=out_features
            )
        else:
            max_ = max(1, autoregressive_features - 1)
            min_ = min(1, autoregressive_features - 1)
            out_degrees = np.arange(out_features) % max_ + min_
        mask = (out_degrees[None, :] >= in_degrees[:, None]).astype(np.float32)
    return mask, out_degrees.astype(np.int64)


class MaskedDense(Module):
    """Dense layer with a fixed binary mask enforcing degree ordering
    (reference MaskedLinear, made.py:17-72)."""

    weight: jnp.ndarray
    bias: Optional[jnp.ndarray]
    mask: jnp.ndarray = buffer()
    degrees: tuple = static()

    def __init__(self, in_degrees, out_features, autoregressive_features,
                 random_mask, is_output, key=None, use_bias=True, rng=None,
                 w_init_scale=None):
        key = ensure_key(key)
        wkey, bkey = jax.random.split(key)
        in_degrees = np.asarray(in_degrees)
        in_features = len(in_degrees)
        mask, degrees = _mask_and_degrees(
            in_degrees, out_features, autoregressive_features, random_mask,
            is_output, rng=rng,
        )
        bound = w_init_scale if w_init_scale is not None else 1.0 / math.sqrt(in_features)
        self.weight = jax.random.uniform(
            wkey, (in_features, out_features), minval=-bound, maxval=bound
        )
        self.bias = (
            jax.random.uniform(bkey, (out_features,), minval=-bound, maxval=bound)
            if use_bias else None
        )
        self.mask = jnp.asarray(mask)
        self.degrees = tuple(int(d) for d in degrees)

    def __call__(self, x):
        y = x @ (self.weight * self.mask)
        if self.bias is not None:
            y = y + self.bias
        return y


class MaskedFeedforwardBlock(Module):
    """BatchNorm? -> masked linear -> activation -> dropout
    (reference made.py:75-123). Output width == input width.

    Batch norm (reference made.py:95-99, eps 1e-3) normalizes per-feature
    over the batch axis — it never mixes features, so the autoregressive
    property is preserved. Like the ResidualNet conditioner, it uses
    per-batch statistics with a learnable scale/offset (running-stats
    inference mode lives at the flow level, transforms/normalization.py)."""

    linear: MaskedDense
    batch_norm: Optional["_BatchScale"]
    dropout: Dropout
    activation: object = static()

    def __init__(self, in_degrees, autoregressive_features, context_features=None,
                 random_mask=False, key=None, activation=jax.nn.relu,
                 dropout_probability=0.0, use_batch_norm=False, rng=None):
        del context_features  # unused, kept for constructor parity
        in_degrees = np.asarray(in_degrees)
        self.batch_norm = (
            _BatchScale(len(in_degrees)) if use_batch_norm else None
        )
        self.linear = MaskedDense(
            in_degrees=in_degrees,
            out_features=len(in_degrees),
            autoregressive_features=autoregressive_features,
            random_mask=random_mask,
            is_output=False,
            key=key,
            rng=rng,
        )
        self.activation = activation
        self.dropout = Dropout(dropout_probability)

    @property
    def degrees(self):
        return self.linear.degrees

    def __call__(self, inputs, context=None, key=None):
        temps = inputs
        if self.batch_norm is not None:
            temps = self.batch_norm(temps, axes=(0,))
        temps = self.linear(temps)
        temps = self.activation(temps)
        return self.dropout(temps, key=key)


class MaskedResidualBlock(Module):
    """Residual block of two masked linears with additive context injection
    (reference made.py:126-202). Requires non-random masks and monotone
    degrees (checked at build)."""

    linear_0: MaskedDense
    linear_1: MaskedDense
    context_layer: Optional[Dense]
    batch_norm_0: Optional["_BatchScale"]
    batch_norm_1: Optional["_BatchScale"]
    dropout: Dropout
    activation: object = static()

    def __init__(self, in_degrees, autoregressive_features, context_features=None,
                 random_mask=False, key=None, activation=jax.nn.relu,
                 dropout_probability=0.0, use_batch_norm=False,
                 zero_initialization=True):
        if random_mask:
            raise ValueError("Masked residual block can't be used with random masks.")
        key = ensure_key(key)
        k0, k1, kc = jax.random.split(key, 3)
        in_degrees = np.asarray(in_degrees)
        features = len(in_degrees)
        self.context_layer = (
            Dense(context_features, features, key=kc)
            if context_features is not None else None
        )
        # reference made.py:148-152: two per-feature batch norms (eps 1e-3);
        # feature-wise normalization preserves the autoregressive property
        self.batch_norm_0 = _BatchScale(features) if use_batch_norm else None
        self.batch_norm_1 = _BatchScale(features) if use_batch_norm else None
        self.linear_0 = MaskedDense(
            in_degrees=in_degrees, out_features=features,
            autoregressive_features=autoregressive_features,
            random_mask=False, is_output=False, key=k0,
        )
        self.linear_1 = MaskedDense(
            in_degrees=np.asarray(self.linear_0.degrees), out_features=features,
            autoregressive_features=autoregressive_features,
            random_mask=False, is_output=False, key=k1,
            w_init_scale=1e-3 if zero_initialization else None,
        )
        degrees = np.asarray(self.linear_1.degrees)
        if not np.all(degrees >= in_degrees):
            raise RuntimeError(
                "In a masked residual block, the output degrees can't be"
                " less than the corresponding input degrees."
            )
        self.activation = activation
        self.dropout = Dropout(dropout_probability)

    @property
    def degrees(self):
        return self.linear_1.degrees

    def __call__(self, inputs, context=None, key=None):
        temps = inputs
        if self.batch_norm_0 is not None:
            temps = self.batch_norm_0(temps, axes=(0,))
        temps = self.activation(temps)
        temps = self.linear_0(temps)
        if context is not None:
            temps = temps + self.context_layer(context)
        if self.batch_norm_1 is not None:
            temps = self.batch_norm_1(temps, axes=(0,))
        temps = self.activation(temps)
        temps = self.dropout(temps, key=key)
        temps = self.linear_1(temps)
        return inputs + temps


class MADE(Module):
    """Masked autoregressive network: initial masked layer (+context linear),
    N blocks, final masked layer with ``features * output_multiplier`` outputs
    (reference made.py:205-283)."""

    initial_layer: MaskedDense
    context_layer: Optional[Dense]
    blocks: tuple
    final_layer: MaskedDense
    use_residual_blocks: bool = static()
    activation: object = static()
    features: int = static()
    hidden_features: int = static()

    def __init__(self, features, hidden_features, context_features=None,
                 num_blocks=2, output_multiplier=1, use_residual_blocks=True,
                 random_mask=False, key=None, activation=jax.nn.relu,
                 dropout_probability=0.0, use_batch_norm=False, rng=None):
        if use_residual_blocks and random_mask:
            raise ValueError("Residual blocks can't be used with random masks.")
        key = ensure_key(key)
        keys = jax.random.split(key, num_blocks + 3)
        if rng is None:
            rng = np.random.default_rng()
        self.features = features
        self.hidden_features = hidden_features

        self.initial_layer = MaskedDense(
            in_degrees=_get_input_degrees(features),
            out_features=hidden_features,
            autoregressive_features=features,
            random_mask=random_mask,
            is_output=False,
            key=keys[0],
            rng=rng,
        )
        self.context_layer = (
            Dense(context_features, hidden_features, key=keys[1])
            if context_features is not None else None
        )
        self.use_residual_blocks = use_residual_blocks
        self.activation = activation

        block_ctor = MaskedResidualBlock if use_residual_blocks else MaskedFeedforwardBlock
        blocks = []
        prev_degrees = np.asarray(self.initial_layer.degrees)
        for i in range(num_blocks):
            block = block_ctor(
                in_degrees=prev_degrees,
                autoregressive_features=features,
                context_features=context_features,
                random_mask=random_mask,
                key=keys[i + 2],
                activation=activation,
                dropout_probability=dropout_probability,
                use_batch_norm=use_batch_norm,
                **({} if use_residual_blocks else {"rng": rng}),
            )
            blocks.append(block)
            prev_degrees = np.asarray(block.degrees)
        self.blocks = tuple(blocks)

        self.final_layer = MaskedDense(
            in_degrees=prev_degrees,
            out_features=features * output_multiplier,
            autoregressive_features=features,
            random_mask=random_mask,
            is_output=True,
            key=keys[-1],
            rng=rng,
        )

    def __call__(self, inputs, context=None, key=None):
        temps = self.initial_layer(inputs)
        if context is not None:
            temps = temps + self.activation(self.context_layer(context))
        if not self.use_residual_blocks:
            temps = self.activation(temps)
        block_keys = (
            jax.random.split(key, len(self.blocks)) if key is not None
            else [None] * len(self.blocks)
        )
        for block, bkey in zip(self.blocks, block_keys):
            temps = block(temps, context, key=bkey)
        return self.final_layer(temps)
