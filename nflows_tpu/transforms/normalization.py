"""Normalization transforms: BatchNorm and ActNorm
(reference: nflows/transforms/normalization.py:72-218).

State handling is explicit-functional (no mutation inside traced code):

- ``BatchNorm``: train mode normalizes with batch statistics (unbiased var,
  matching torch's default); running statistics are updated by the explicit
  ``initialize_with_data`` / ``update_running_stats`` pass, not as a side
  effect of forward. Eval mode (``training=False``) uses running stats and
  is the only mode with an inverse — same limitation as the reference
  (normalization.py:120-124).
- ``ActNorm``: Glow-style per-feature affine with data-dependent init. The
  reference lazily initializes on the first train-mode forward
  (normalization.py:175-218); here initialization is the explicit
  ``initialize_with_data(batch)`` step (returns a new, initialized module),
  which composes through CompositeTransform chains.

Use ``nflows_tpu.core.set_training(flow, False)`` to flip every
``training`` flag in a model pytree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nflows_tpu.core.module import buffer, static
from nflows_tpu.transforms.base import InverseNotAvailable, Transform
import nflows_tpu.utils.typechecks as check

__all__ = ["BatchNorm", "ActNorm"]


class BatchNorm(Transform):
    """Batch-normalization transform for 1-dim inputs."""

    unconstrained_weight: jnp.ndarray
    bias: jnp.ndarray
    running_mean: jnp.ndarray = buffer()
    running_var: jnp.ndarray = buffer()
    eps: float = static()
    momentum: float = static()
    training: bool = static()

    def __init__(self, features, eps=1e-5, momentum=0.1, affine=True,
                 training: bool = True):
        if not check.is_positive_int(features):
            raise TypeError("Number of features must be a positive integer.")
        del affine  # parity kwarg; weight/bias are always present
        self.momentum = momentum
        self.eps = eps
        constant = float(np.log(np.exp(1 - eps) - 1))
        self.unconstrained_weight = constant * jnp.ones(features)
        self.bias = jnp.zeros(features)
        self.running_mean = jnp.zeros(features)
        self.running_var = jnp.zeros(features)
        self.training = training

    @property
    def weight(self):
        return jnp.logaddexp(self.unconstrained_weight, 0.0) + self.eps

    def _batch_stats(self, inputs):
        mean = jnp.mean(inputs, axis=0)
        var = jnp.var(inputs, axis=0, ddof=1)  # torch-default unbiased
        return mean, var

    def forward(self, inputs, context=None):
        if inputs.ndim != 2:
            raise ValueError(
                f"Expected 2-dim inputs, got inputs of shape: {inputs.shape}"
            )
        if self.training:
            mean, var = self._batch_stats(inputs)
        else:
            mean, var = self.running_mean, self.running_var

        weight = self.weight
        outputs = weight * ((inputs - mean) / jnp.sqrt(var + self.eps)) + self.bias
        logabsdet_ = jnp.log(weight) - 0.5 * jnp.log(var + self.eps)
        logabsdet = jnp.sum(logabsdet_) * jnp.ones(
            inputs.shape[0], dtype=inputs.dtype
        )
        return outputs, logabsdet

    def inverse(self, inputs, context=None):
        if self.training:
            raise InverseNotAvailable(
                "Batch norm inverse is only available in eval mode, not in "
                "training mode."
            )
        if inputs.ndim != 2:
            raise ValueError(
                f"Expected 2-dim inputs, got inputs of shape: {inputs.shape}"
            )
        weight = self.weight
        outputs = (
            jnp.sqrt(self.running_var + self.eps) * ((inputs - self.bias) / weight)
            + self.running_mean
        )
        logabsdet_ = -jnp.log(weight) + 0.5 * jnp.log(self.running_var + self.eps)
        logabsdet = jnp.sum(logabsdet_) * jnp.ones(
            inputs.shape[0], dtype=inputs.dtype
        )
        return outputs, logabsdet

    def update_running_stats(self, inputs) -> "BatchNorm":
        """EMA update of running statistics (reference normalization.py:104-107)."""
        mean, var = self._batch_stats(inputs)
        m = self.momentum
        return self.replace(
            running_mean=(1 - m) * self.running_mean + m * mean,
            running_var=(1 - m) * self.running_var + m * var,
        )

    def initialize_with_data(self, inputs, context=None):
        """One-shot absorption: set running stats to the batch statistics
        (momentum-free). The per-step EMA (reference semantics) is
        :meth:`update_running_stats`; this method is the explicit
        "statistics pass before eval" and must not be scaled by momentum —
        stats start at zero, so an EMA step would leave them at
        ``momentum * stat``."""
        mean, var = self._batch_stats(inputs)
        new = self.replace(running_mean=mean, running_var=var)
        outputs, _ = new.forward(inputs, context)
        return new, outputs


class ActNorm(Transform):
    """Glow activation normalization for 2D/4D inputs; per-channel for images
    (reference normalization.py:144-218)."""

    log_scale: jnp.ndarray
    shift: jnp.ndarray
    initialized: bool = static()

    def __init__(self, features):
        if not check.is_positive_int(features):
            raise TypeError("Number of features must be a positive integer.")
        self.log_scale = jnp.zeros(features)
        self.shift = jnp.zeros(features)
        self.initialized = False

    @property
    def scale(self):
        return jnp.exp(self.log_scale)

    def _broadcastable(self, inputs):
        if inputs.ndim == 4:
            return self.scale.reshape(1, -1, 1, 1), self.shift.reshape(1, -1, 1, 1)
        return self.scale.reshape(1, -1), self.shift.reshape(1, -1)

    def forward(self, inputs, context=None):
        if inputs.ndim not in (2, 4):
            raise ValueError("Expecting inputs to be a 2D or a 4D tensor.")
        scale, shift = self._broadcastable(inputs)
        outputs = scale * inputs + shift
        if inputs.ndim == 4:
            batch_size, _, h, w = inputs.shape
            logabsdet = h * w * jnp.sum(self.log_scale) * jnp.ones(
                batch_size, dtype=inputs.dtype
            )
        else:
            batch_size = inputs.shape[0]
            logabsdet = jnp.sum(self.log_scale) * jnp.ones(
                batch_size, dtype=inputs.dtype
            )
        return outputs, logabsdet

    def inverse(self, inputs, context=None):
        if inputs.ndim not in (2, 4):
            raise ValueError("Expecting inputs to be a 2D or a 4D tensor.")
        scale, shift = self._broadcastable(inputs)
        outputs = (inputs - shift) / scale
        if inputs.ndim == 4:
            batch_size, _, h, w = inputs.shape
            logabsdet = -h * w * jnp.sum(self.log_scale) * jnp.ones(
                batch_size, dtype=inputs.dtype
            )
        else:
            batch_size = inputs.shape[0]
            logabsdet = -jnp.sum(self.log_scale) * jnp.ones(
                batch_size, dtype=inputs.dtype
            )
        return outputs, logabsdet

    def initialize_with_data(self, inputs, context=None):
        """Data-dependent init so post-actnorm activations are zero-mean,
        unit-variance (reference normalization.py:206-218). Idempotent: a
        second call on an initialized module is a plain forward."""
        if self.initialized:
            outputs, _ = self.forward(inputs, context)
            return self, outputs
        x = inputs
        if x.ndim == 4:
            num_channels = x.shape[1]
            x = x.transpose(0, 2, 3, 1).reshape(-1, num_channels)
        std = jnp.std(x, axis=0, ddof=1)
        mu = jnp.mean(x / std, axis=0)
        new = self.replace(
            log_scale=-jnp.log(std), shift=-mu, initialized=True
        )
        outputs, _ = new.forward(inputs, context)
        return new, outputs
