"""Glow invertible 1x1 convolution (reference: nflows/transforms/conv.py:6-47).

A fixed random channel permutation followed by an LU-parameterized linear
map applied per-pixel: BCHW is reshaped to (B·H·W)×C so the channel mixing
is one big MXU GEMM instead of a 1x1 conv kernel.
"""

from __future__ import annotations

from nflows_tpu.transforms.lu import LULinear
from nflows_tpu.transforms.permutations import RandomPermutation
from nflows_tpu.utils import shapes as shapeutils

__all__ = ["OneByOneConvolution"]


class OneByOneConvolution(LULinear):
    """Invertible 1x1 convolution = fixed permutation + LU linear per pixel."""

    permutation: RandomPermutation

    def __init__(self, num_channels, using_cache=False, identity_init=True,
                 key=None, rng=None):
        super().__init__(num_channels, using_cache, identity_init, key=key)
        self.permutation = RandomPermutation(num_channels, dim=1, rng=rng)

    def _lu_forward_inverse(self, inputs, inverse=False):
        b, c, h, w = inputs.shape
        inputs = inputs.transpose(0, 2, 3, 1).reshape(b * h * w, c)

        if inverse:
            outputs, logabsdet = super().inverse(inputs)
        else:
            outputs, logabsdet = super().forward(inputs)

        outputs = outputs.reshape(b, h, w, c).transpose(0, 3, 1, 2)
        logabsdet = logabsdet.reshape(b, h, w)
        return outputs, shapeutils.sum_except_batch(logabsdet)

    def forward(self, inputs, context=None):
        if inputs.ndim != 4:
            raise ValueError("Inputs must be a 4D tensor.")
        inputs, _ = self.permutation.forward(inputs)
        return self._lu_forward_inverse(inputs, inverse=False)

    def inverse(self, inputs, context=None):
        if inputs.ndim != 4:
            raise ValueError("Inputs must be a 4D tensor.")
        outputs, logabsdet = self._lu_forward_inverse(inputs, inverse=True)
        outputs, _ = self.permutation.inverse(outputs)
        return outputs, logabsdet
