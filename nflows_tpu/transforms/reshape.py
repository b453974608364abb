"""Squeeze (space-to-depth) transform (reference: nflows/transforms/reshape.py:7-68).

Trades spatial extent for channels (RealNVP/Glow multiscale building block).
Pure reshape/transpose — a layout change XLA folds into neighbours; logdet 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.transforms.base import Transform
import nflows_tpu.utils.typechecks as check

__all__ = ["SqueezeTransform"]


class SqueezeTransform(Transform):
    """Space-to-depth: (C, H, W) -> (C*f², H/f, W/f)."""

    factor: int = static()

    def __init__(self, factor: int = 2):
        if not check.is_int(factor) or factor <= 1:
            raise ValueError("Factor must be an integer > 1.")
        self.factor = factor

    def get_output_shape(self, c, h, w):
        return (c * self.factor * self.factor, h // self.factor, w // self.factor)

    def forward(self, inputs, context=None):
        if inputs.ndim != 4:
            raise ValueError("Expecting inputs with 4 dimensions")
        batch_size, c, h, w = inputs.shape
        f = self.factor
        if h % f != 0 or w % f != 0:
            raise ValueError("Input image size not compatible with the factor.")

        out = inputs.reshape(batch_size, c, h // f, f, w // f, f)
        out = out.transpose(0, 1, 3, 5, 2, 4)
        out = out.reshape(batch_size, c * f * f, h // f, w // f)
        return out, jnp.zeros(batch_size, dtype=inputs.dtype)

    def inverse(self, inputs, context=None):
        if inputs.ndim != 4:
            raise ValueError("Expecting inputs with 4 dimensions")
        batch_size, c, h, w = inputs.shape
        f = self.factor
        # factor-generic check (the reference hardcodes 4, reshape.py:49,
        # which is wrong for factor != 2 despite accepting any factor > 1)
        if c < f ** 2 or c % (f ** 2) != 0:
            raise ValueError("Invalid number of channel dimensions.")

        out = inputs.reshape(batch_size, c // f ** 2, f, f, h, w)
        out = out.transpose(0, 1, 4, 2, 5, 3)
        out = out.reshape(batch_size, c // f ** 2, h * f, w * f)
        return out, jnp.zeros(batch_size, dtype=inputs.dtype)
