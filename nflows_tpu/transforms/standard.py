"""Standard transforms (reference: nflows/transforms/standard.py:12-90)."""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from nflows_tpu.core.module import buffer
from nflows_tpu.transforms.base import Transform

__all__ = ["IdentityTransform", "PointwiseAffineTransform", "AffineTransform",
           "AffineScalarTransform"]


class IdentityTransform(Transform):
    """Leaves input unchanged (reference standard.py:12-22)."""

    def forward(self, inputs, context=None):
        return inputs, jnp.zeros(inputs.shape[0], dtype=inputs.dtype)

    def inverse(self, inputs, context=None):
        return self.forward(inputs, context)


class PointwiseAffineTransform(Transform):
    """X -> X * scale + shift with fixed (non-trainable) scale/shift
    (reference standard.py:25-67)."""

    shift: jnp.ndarray = buffer()
    scale: jnp.ndarray = buffer()

    def __init__(self, shift=0.0, scale=1.0):
        shift = jnp.asarray(shift, dtype=jnp.float32)
        scale = jnp.asarray(scale, dtype=jnp.float32)
        if bool(np.any(np.asarray(scale) == 0.0)):
            raise ValueError("Scale must be non-zero.")
        self.shift = shift
        self.scale = scale

    def _log_abs_scale(self):
        return jnp.log(jnp.abs(self.scale))

    def _batch_logabsdet(self, batch_shape):
        log_abs_scale = self._log_abs_scale()
        if log_abs_scale.size > 1:
            return jnp.sum(jnp.broadcast_to(log_abs_scale, batch_shape))
        # scalar: n * log|scale| is more accurate than summing n copies
        # (reference standard.py:48-52)
        return jnp.squeeze(log_abs_scale) * float(np.prod(batch_shape))

    def forward(self, inputs, context=None):
        batch_size, batch_shape = inputs.shape[0], inputs.shape[1:]
        outputs = inputs * self.scale + self.shift
        logabsdet = jnp.broadcast_to(self._batch_logabsdet(batch_shape), (batch_size,))
        return outputs, logabsdet

    def inverse(self, inputs, context=None):
        batch_size, batch_shape = inputs.shape[0], inputs.shape[1:]
        outputs = (inputs - self.shift) / self.scale
        logabsdet = jnp.broadcast_to(-self._batch_logabsdet(batch_shape), (batch_size,))
        return outputs, logabsdet


class AffineTransform(PointwiseAffineTransform):
    """Deprecated alias (reference standard.py:70-87)."""

    def __init__(self, shift=0.0, scale=1.0):
        warnings.warn("Use PointwiseAffineTransform", DeprecationWarning)
        if shift is None:
            shift = 0.0
            warnings.warn(f"`shift=None` deprecated; default is {shift}")
        if scale is None:
            scale = 1.0
            warnings.warn(f"`scale=None` deprecated; default is {scale}.")
        super().__init__(shift, scale)


AffineScalarTransform = AffineTransform
