"""Basic trainable layers: Dense, Conv2d, activations, Dropout.

These are the in-house building blocks for conditioner networks (the
reference builds on torch.nn.Linear / Conv2d). Initialization matches
torch defaults distributionally: weights and biases ~ U(-1/sqrt(fan_in),
+1/sqrt(fan_in)) (torch's kaiming_uniform(a=sqrt(5)) reduces to exactly
that bound).

Dense uses [in, out]-ordered weights so the forward pass is ``x @ W + b`` —
a single MXU GEMM with no transposition. Conv2d runs NCHW to match the
reference's image shape convention; XLA's layout assignment re-tiles for
the MXU internally.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.core.module import Module, static

__all__ = ["Dense", "Conv2d", "Dropout", "glu", "ensure_key"]


def ensure_key(key) -> jax.Array:
    """Accept a PRNG key or None (fresh nondeterministic key, like torch's
    global-RNG construction)."""
    if key is None:
        return jax.random.key(int(np.random.default_rng().integers(2 ** 31)))
    return key


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Gated linear unit: split in half along axis, a * sigmoid(b)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


class Dense(Module):
    """Affine layer y = x @ W + b."""

    weight: jnp.ndarray
    bias: Optional[jnp.ndarray]

    def __init__(self, in_features: int, out_features: int, key=None,
                 use_bias: bool = True, w_init_scale: Optional[float] = None):
        key = ensure_key(key)
        wkey, bkey = jax.random.split(key)
        bound = w_init_scale if w_init_scale is not None else 1.0 / math.sqrt(in_features)
        self.weight = jax.random.uniform(
            wkey, (in_features, out_features), minval=-bound, maxval=bound
        )
        if use_bias:
            bbound = 1.0 / math.sqrt(in_features)
            if w_init_scale is not None:
                bbound = w_init_scale
            self.bias = jax.random.uniform(
                bkey, (out_features,), minval=-bbound, maxval=bbound
            )
        else:
            self.bias = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x @ self.weight
        if self.bias is not None:
            y = y + self.bias
        return y


class Conv2d(Module):
    """2D convolution over NCHW inputs, weight layout OIHW (torch-compatible
    shapes; XLA re-layouts for the MXU)."""

    weight: jnp.ndarray
    bias: Optional[jnp.ndarray]
    stride: tuple = static()
    padding: tuple = static()
    layout: str = static()

    def __init__(self, in_channels: int, out_channels: int, kernel_size,
                 key=None, stride=1, padding=0, use_bias: bool = True,
                 w_init_scale: Optional[float] = None, layout: str = "auto"):
        key = ensure_key(key)
        wkey, bkey = jax.random.split(key)
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if isinstance(stride, int):
            stride = (stride, stride)
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        elif (isinstance(padding, (tuple, list)) and len(padding) == 2
              and all(isinstance(p, int) for p in padding)):
            # torch-style (ph, pw) -> lax ((ph, ph), (pw, pw))
            padding = ((padding[0], padding[0]), (padding[1], padding[1]))
        fan_in = in_channels * kernel_size[0] * kernel_size[1]
        bound = w_init_scale if w_init_scale is not None else 1.0 / math.sqrt(fan_in)
        self.weight = jax.random.uniform(
            wkey, (out_channels, in_channels, *kernel_size), minval=-bound, maxval=bound
        )
        if use_bias:
            bbound = bound if w_init_scale is not None else 1.0 / math.sqrt(fan_in)
            self.bias = jax.random.uniform(
                bkey, (out_channels,), minval=-bbound, maxval=bbound
            )
        else:
            self.bias = None
        self.stride = tuple(stride)
        self.padding = tuple(padding)
        if layout not in ("auto", "nchw", "nhwc"):
            raise ValueError("layout must be 'auto', 'nchw', or 'nhwc'")
        self.layout = layout

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from nflows_tpu.config import conv_layout

        # per-instance override beats the global config switch; 'auto'
        # (the default) defers to config.conv_layout()
        layout = self.layout if self.layout != "auto" else conv_layout()
        if layout == "nhwc":
            # TPU-native layout: channels ride the lanes. Arrays stay NCHW
            # at module boundaries; XLA folds the adjacent transposes
            # between consecutive convs (see config.conv_layout).
            y = jax.lax.conv_general_dilated(
                x, self.weight,
                window_strides=self.stride,
                padding=self.padding,
                dimension_numbers=("NCHW", "OIHW", "NHWC"),
            )
            if self.bias is not None:
                y = y + self.bias[None, None, None, :]
            return y.transpose(0, 3, 1, 2)
        y = jax.lax.conv_general_dilated(
            x, self.weight,
            window_strides=self.stride,
            padding=self.padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.bias is not None:
            y = y + self.bias[None, :, None, None]
        return y


class Dropout(Module):
    """Dropout active only when a PRNG key is available.

    The reference applies torch Dropout inside conditioners
    (nn/nets/resnet.py:35,48) gated by train mode; here randomness is
    explicit: pass ``key=`` directly, or enter
    ``nflows_tpu.core.stochastic(key)`` around the traced loss and every
    dropout site draws its own folded key. No key (the default) = eval =
    identity.
    """

    rate: float = static()

    def __init__(self, rate: float = 0.0):
        self.rate = float(rate)

    def __call__(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        if self.rate == 0.0:
            return x
        if key is None:
            from nflows_tpu.core.stochastic import next_rng_key
            key = next_rng_key()
        if key is None:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
