"""Invertible elementwise nonlinearities and learned-CDF transforms
(reference: nflows/transforms/nonlinearities.py).

All piecewise (masked-region) math is restructured as full-width
``jnp.where`` selects with per-branch operand sanitization so nothing NaNs
under jit or in gradients. Domain violations clamp (with the reference's
eps where it has one) instead of raising inside traced code.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import buffer, static
from nflows_tpu.ops import splines
from nflows_tpu.transforms.base import (
    CompositeTransform,
    InputOutsideDomain,
    InverseTransform,
    Transform,
)
from nflows_tpu.utils import shapes as shapeutils

__all__ = [
    "Exp", "Tanh", "LogTanh", "LeakyReLU", "Sigmoid", "Logit",
    "GatedLinearUnit", "CauchyCDF", "CauchyCDFInverse", "CompositeCDFTransform",
    "PiecewiseLinearCDF", "PiecewiseQuadraticCDF", "PiecewiseCubicCDF",
    "PiecewiseRationalQuadraticCDF",
    "PiecewiseLinearRationalCDF",
]

_sum = shapeutils.sum_except_batch


class Exp(Transform):
    """y = exp(x) (reference nonlinearities.py:18-32)."""

    def forward(self, inputs, context=None):
        outputs = jnp.exp(inputs)
        return outputs, _sum(inputs, num_batch_dims=1)

    def inverse(self, inputs, context=None):
        # domain x > 0; clamp at tiny to avoid -inf/NaN inside jit
        safe = jnp.maximum(inputs, jnp.finfo(inputs.dtype).tiny)
        outputs = jnp.log(safe)
        return outputs, -_sum(outputs, num_batch_dims=1)


class Tanh(Transform):
    """(reference nonlinearities.py:35-48)."""

    def forward(self, inputs, context=None):
        outputs = jnp.tanh(inputs)
        logabsdet = jnp.log1p(-outputs ** 2)
        return outputs, _sum(logabsdet, num_batch_dims=1)

    def inverse(self, inputs, context=None):
        eps = 1e-7
        x = jnp.clip(inputs, -1 + eps, 1 - eps)
        outputs = 0.5 * jnp.log((1 + x) / (1 - x))
        logabsdet = -jnp.log1p(-x ** 2)
        return outputs, _sum(logabsdet, num_batch_dims=1)


class LogTanh(Transform):
    """Tanh core with alpha*log(beta*x) tails beyond |x| > cut_point, matched
    in value and derivative (reference nonlinearities.py:51-113)."""

    cut_point: float = static()
    inv_cut_point: float = static()
    alpha: float = static()
    beta: float = static()

    def __init__(self, cut_point: float = 1.0):
        if cut_point <= 0:
            raise ValueError("Cut point must be positive.")
        self.cut_point = float(cut_point)
        self.inv_cut_point = float(np.tanh(cut_point))
        self.alpha = float((1 - np.tanh(np.tanh(cut_point))) / cut_point)
        self.beta = float(np.exp(
            (np.tanh(cut_point) - self.alpha * np.log(cut_point)) / self.alpha
        ))

    def forward(self, inputs, context=None):
        mask_right = inputs > self.cut_point
        mask_left = inputs < -self.cut_point

        tanh_out = jnp.tanh(inputs)
        safe_right = jnp.where(mask_right, inputs, 1.0)
        safe_left = jnp.where(mask_left, inputs, -1.0)
        right_out = self.alpha * jnp.log(self.beta * safe_right)
        left_out = -self.alpha * jnp.log(-self.beta * safe_left)

        outputs = jnp.where(mask_right, right_out,
                            jnp.where(mask_left, left_out, tanh_out))

        lad_mid = jnp.log1p(-jnp.clip(tanh_out, -1 + 1e-7, 1 - 1e-7) ** 2)
        lad_right = jnp.log(self.alpha / safe_right)
        lad_left = jnp.log(-self.alpha / safe_left)
        logabsdet = jnp.where(mask_right, lad_right,
                              jnp.where(mask_left, lad_left, lad_mid))
        return outputs, _sum(logabsdet, num_batch_dims=1)

    def inverse(self, inputs, context=None):
        mask_right = inputs > self.inv_cut_point
        mask_left = inputs < -self.inv_cut_point

        safe_mid = jnp.clip(inputs, -self.inv_cut_point, self.inv_cut_point)
        mid_out = 0.5 * jnp.log((1 + safe_mid) / (1 - safe_mid))
        right_out = jnp.exp(inputs / self.alpha) / self.beta
        left_out = -jnp.exp(-inputs / self.alpha) / self.beta

        outputs = jnp.where(mask_right, right_out,
                            jnp.where(mask_left, left_out, mid_out))

        log_ab = float(np.log(self.alpha * self.beta))
        lad_mid = -jnp.log1p(-safe_mid ** 2)
        lad_right = -log_ab + inputs / self.alpha
        lad_left = -log_ab - inputs / self.alpha
        logabsdet = jnp.where(mask_right, lad_right,
                              jnp.where(mask_left, lad_left, lad_mid))
        return outputs, _sum(logabsdet, num_batch_dims=1)


class LeakyReLU(Transform):
    """(reference nonlinearities.py:116-136)."""

    negative_slope: float = static()

    def __init__(self, negative_slope: float = 1e-2):
        if negative_slope <= 0:
            raise ValueError("Slope must be positive.")
        self.negative_slope = float(negative_slope)

    def forward(self, inputs, context=None):
        outputs = jnp.where(inputs >= 0, inputs, self.negative_slope * inputs)
        mask = (inputs < 0).astype(inputs.dtype)
        logabsdet = float(np.log(self.negative_slope)) * mask
        return outputs, _sum(logabsdet, num_batch_dims=1)

    def inverse(self, inputs, context=None):
        outputs = jnp.where(inputs >= 0, inputs, inputs / self.negative_slope)
        mask = (inputs < 0).astype(inputs.dtype)
        logabsdet = -float(np.log(self.negative_slope)) * mask
        return outputs, _sum(logabsdet, num_batch_dims=1)


class Sigmoid(Transform):
    """Tempered sigmoid, optionally learnable temperature
    (reference nonlinearities.py:139-169)."""

    temperature: object  # trainable [1] array when learnable, else None
    eps: float = static()
    learn_temperature: bool = static()
    fixed_temperature: object = static(default=None)

    def __init__(self, temperature=1.0, eps: float = 1e-6,
                 learn_temperature: bool = False):
        self.eps = eps
        self.learn_temperature = learn_temperature
        if learn_temperature:
            self.temperature = jnp.asarray([float(temperature)])
            self.fixed_temperature = None
        else:
            # a fixed temperature must NOT be a trainable leaf: partition()
            # would hand it to the optimizer and e.g. adamw weight decay
            # would silently shrink it (reference registers a buffer here,
            # nonlinearities.py:144-147)
            self.temperature = None
            self.fixed_temperature = float(temperature)

    def _temp(self):
        if self.learn_temperature:
            return self.temperature
        return jnp.asarray([self.fixed_temperature])

    def forward(self, inputs, context=None):
        t = self._temp()
        z = t * inputs
        outputs = jax.nn.sigmoid(z)
        logabsdet = _sum(
            jnp.log(t) - jax.nn.softplus(-z) - jax.nn.softplus(z)
        )
        return outputs, logabsdet

    def inverse(self, inputs, context=None):
        t = self._temp()
        x = jnp.clip(inputs, self.eps, 1 - self.eps)
        outputs = (1 / t) * (jnp.log(x) - jnp.log1p(-x))
        logabsdet = -_sum(
            jnp.log(t) - jax.nn.softplus(-t * outputs) - jax.nn.softplus(t * outputs)
        )
        return outputs, logabsdet


class Logit(InverseTransform):
    """(reference nonlinearities.py:172-174)."""

    def __init__(self, temperature=1.0, eps: float = 1e-6):
        super().__init__(Sigmoid(temperature=temperature, eps=eps))


class GatedLinearUnit(Transform):
    """Context-gated scaling: y = x * sigmoid(context)
    (reference nonlinearities.py:177-189). Context must be [batch, 1]."""

    def forward(self, inputs, context=None):
        gate = jax.nn.sigmoid(context)
        return inputs * gate, jnp.log(gate).reshape(-1)

    def inverse(self, inputs, context=None):
        gate = jax.nn.sigmoid(context)
        return inputs / gate, -jnp.log(gate).reshape(-1)


class CauchyCDF(Transform):
    """(reference nonlinearities.py:192-211)."""

    def __init__(self, location=None, scale=None, features=None):
        pass

    def forward(self, inputs, context=None):
        outputs = (1 / np.pi) * jnp.arctan(inputs) + 0.5
        logabsdet = _sum(-float(np.log(np.pi)) - jnp.log1p(inputs ** 2))
        return outputs, logabsdet

    def inverse(self, inputs, context=None):
        eps = 1e-7
        x = jnp.clip(inputs, eps, 1 - eps)
        outputs = jnp.tan(np.pi * (x - 0.5))
        logabsdet = -_sum(-float(np.log(np.pi)) - jnp.log1p(outputs ** 2))
        return outputs, logabsdet


class CauchyCDFInverse(InverseTransform):
    """(reference nonlinearities.py:214-216)."""

    def __init__(self, location=None, scale=None, features=None):
        super().__init__(CauchyCDF(location=location, scale=scale, features=features))


class CompositeCDFTransform(CompositeTransform):
    """squash -> cdf -> unsquash (reference nonlinearities.py:219-223)."""

    def __init__(self, squashing_transform, cdf_transform):
        super().__init__(
            [squashing_transform, cdf_transform, InverseTransform(squashing_transform)]
        )


class PiecewiseLinearRationalCDF(Transform):
    """Elementwise learned linear-rational-spline CDF (Dolatabadi et al.
    2020, arXiv:2001.05168) — beyond the reference library; the LRS
    counterpart of PiecewiseRationalQuadraticCDF."""

    unnormalized_widths: jnp.ndarray
    unnormalized_heights: jnp.ndarray
    unnormalized_derivatives: jnp.ndarray
    unnormalized_lambdas: jnp.ndarray
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()
    min_derivative: float = static()
    min_lambda: float = static()

    def __init__(self, shape, num_bins=10, tails=None, tail_bound=1.0,
                 min_bin_width=splines.linear_rational.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.linear_rational.DEFAULT_MIN_BIN_HEIGHT,
                 min_derivative=splines.linear_rational.DEFAULT_MIN_DERIVATIVE,
                 min_lambda=splines.linear_rational.DEFAULT_MIN_LAMBDA,
                 key=None):
        from nflows_tpu.nn.primitives import ensure_key
        key = ensure_key(key)
        keys = jax.random.split(key, 4)
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height
        self.min_derivative = min_derivative
        self.min_lambda = min_lambda

        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        num_derivatives = (num_bins - 1) if tails == "linear" else (num_bins + 1)
        self.unnormalized_widths = jax.random.uniform(keys[0], (*shape, num_bins))
        self.unnormalized_heights = jax.random.uniform(keys[1], (*shape, num_bins))
        self.unnormalized_derivatives = jax.random.uniform(
            keys[2], (*shape, num_derivatives))
        self.unnormalized_lambdas = jax.random.uniform(
            keys[3], (*shape, num_bins), minval=-0.5, maxval=0.5)

    def _spline(self, inputs, inverse=False):
        batch_size = inputs.shape[0]
        w = _share_across_batch(self.unnormalized_widths, batch_size)
        h = _share_across_batch(self.unnormalized_heights, batch_size)
        d = _share_across_batch(self.unnormalized_derivatives, batch_size)
        lam = _share_across_batch(self.unnormalized_lambdas, batch_size)
        kwargs = {}
        if self.tails is None:
            spline_fn = splines.linear_rational_spline
        else:
            spline_fn = splines.unconstrained_linear_rational_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        outputs, logabsdet = spline_fn(
            inputs=inputs, unnormalized_widths=w, unnormalized_heights=h,
            unnormalized_derivatives=d, unnormalized_lambdas=lam,
            inverse=inverse, min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height,
            min_derivative=self.min_derivative, min_lambda=self.min_lambda,
            **kwargs,
        )
        return outputs, _sum(logabsdet)

    def forward(self, inputs, context=None):
        return self._spline(inputs, inverse=False)

    def inverse(self, inputs, context=None):
        return self._spline(inputs, inverse=True)


def _share_across_batch(params, batch_size):
    return jnp.broadcast_to(params[None, ...], (batch_size,) + params.shape)


class PiecewiseLinearCDF(Transform):
    """Elementwise linear-spline transform with per-feature trainable params
    shared across the batch (reference nonlinearities.py:230-263)."""

    unnormalized_pdf: jnp.ndarray
    tails: object = static()
    tail_bound: float = static()

    def __init__(self, shape, num_bins=10, tails=None, tail_bound=1.0, key=None):
        from nflows_tpu.nn.primitives import ensure_key
        key = ensure_key(key)
        self.tails = tails
        self.tail_bound = tail_bound
        self.unnormalized_pdf = jax.random.normal(key, (*shape, num_bins))

    def _spline(self, inputs, inverse=False):
        batch_size = inputs.shape[0]
        unnormalized_pdf = _share_across_batch(self.unnormalized_pdf, batch_size)
        if self.tails is None:
            outputs, logabsdet = splines.linear_spline(
                inputs=inputs, unnormalized_pdf=unnormalized_pdf, inverse=inverse
            )
        else:
            outputs, logabsdet = splines.unconstrained_linear_spline(
                inputs=inputs, unnormalized_pdf=unnormalized_pdf, inverse=inverse,
                tails=self.tails, tail_bound=self.tail_bound,
            )
        return outputs, _sum(logabsdet)

    def forward(self, inputs, context=None):
        return self._spline(inputs, inverse=False)

    def inverse(self, inputs, context=None):
        return self._spline(inputs, inverse=True)


class PiecewiseQuadraticCDF(Transform):
    """(reference nonlinearities.py:266-319)."""

    unnormalized_widths: jnp.ndarray
    unnormalized_heights: jnp.ndarray
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()

    def __init__(self, shape, num_bins=10, tails=None, tail_bound=1.0,
                 min_bin_width=splines.quadratic.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.quadratic.DEFAULT_MIN_BIN_HEIGHT,
                 key=None):
        from nflows_tpu.nn.primitives import ensure_key
        key = ensure_key(key)
        k1, k2 = jax.random.split(key)
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height
        self.unnormalized_widths = jax.random.normal(k1, (*shape, num_bins))
        num_heights = num_bins + 1 if tails is None else num_bins - 1
        self.unnormalized_heights = jax.random.normal(k2, (*shape, num_heights))

    def _spline(self, inputs, inverse=False):
        batch_size = inputs.shape[0]
        w = _share_across_batch(self.unnormalized_widths, batch_size)
        h = _share_across_batch(self.unnormalized_heights, batch_size)
        kwargs = {}
        if self.tails is None:
            spline_fn = splines.quadratic_spline
        else:
            spline_fn = splines.unconstrained_quadratic_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        outputs, logabsdet = spline_fn(
            inputs=inputs, unnormalized_widths=w, unnormalized_heights=h,
            inverse=inverse, min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height, **kwargs,
        )
        return outputs, _sum(logabsdet)

    def forward(self, inputs, context=None):
        return self._spline(inputs, inverse=False)

    def inverse(self, inputs, context=None):
        return self._spline(inputs, inverse=True)


class PiecewiseCubicCDF(Transform):
    """(reference nonlinearities.py:322-383)."""

    unnormalized_widths: jnp.ndarray
    unnormalized_heights: jnp.ndarray
    unnorm_derivatives_left: jnp.ndarray
    unnorm_derivatives_right: jnp.ndarray
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()

    def __init__(self, shape, num_bins=10, tails=None, tail_bound=1.0,
                 min_bin_width=splines.cubic.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.cubic.DEFAULT_MIN_BIN_HEIGHT,
                 key=None):
        from nflows_tpu.nn.primitives import ensure_key
        key = ensure_key(key)
        keys = jax.random.split(key, 4)
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height
        self.unnormalized_widths = jax.random.normal(keys[0], (*shape, num_bins))
        self.unnormalized_heights = jax.random.normal(keys[1], (*shape, num_bins))
        self.unnorm_derivatives_left = jax.random.normal(keys[2], (*shape, 1))
        self.unnorm_derivatives_right = jax.random.normal(keys[3], (*shape, 1))

    def _spline(self, inputs, inverse=False):
        batch_size = inputs.shape[0]
        w = _share_across_batch(self.unnormalized_widths, batch_size)
        h = _share_across_batch(self.unnormalized_heights, batch_size)
        dl = _share_across_batch(self.unnorm_derivatives_left, batch_size)
        dr = _share_across_batch(self.unnorm_derivatives_right, batch_size)
        kwargs = {}
        if self.tails is None:
            spline_fn = splines.cubic_spline
        else:
            spline_fn = splines.unconstrained_cubic_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        outputs, logabsdet = spline_fn(
            inputs=inputs, unnormalized_widths=w, unnormalized_heights=h,
            unnorm_derivatives_left=dl, unnorm_derivatives_right=dr,
            inverse=inverse, min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height, **kwargs,
        )
        return outputs, _sum(logabsdet)

    def forward(self, inputs, context=None):
        return self._spline(inputs, inverse=False)

    def inverse(self, inputs, context=None):
        return self._spline(inputs, inverse=True)


class PiecewiseRationalQuadraticCDF(Transform):
    """(reference nonlinearities.py:386-467)."""

    unnormalized_widths: jnp.ndarray
    unnormalized_heights: jnp.ndarray
    unnormalized_derivatives: jnp.ndarray
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()
    min_derivative: float = static()

    def __init__(self, shape, num_bins=10, tails=None, tail_bound=1.0,
                 identity_init=False,
                 min_bin_width=splines.rational_quadratic.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.rational_quadratic.DEFAULT_MIN_BIN_HEIGHT,
                 min_derivative=splines.rational_quadratic.DEFAULT_MIN_DERIVATIVE,
                 key=None):
        from nflows_tpu.nn.primitives import ensure_key
        key = ensure_key(key)
        keys = jax.random.split(key, 3)
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height
        self.min_derivative = min_derivative

        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        num_derivatives = (num_bins - 1) if tails == "linear" else (num_bins + 1)
        if identity_init:
            self.unnormalized_widths = jnp.zeros((*shape, num_bins))
            self.unnormalized_heights = jnp.zeros((*shape, num_bins))
            constant = float(np.log(np.exp(1 - min_derivative) - 1))
            self.unnormalized_derivatives = constant * jnp.ones(
                (*shape, num_derivatives)
            )
        else:
            self.unnormalized_widths = jax.random.uniform(keys[0], (*shape, num_bins))
            self.unnormalized_heights = jax.random.uniform(keys[1], (*shape, num_bins))
            self.unnormalized_derivatives = jax.random.uniform(
                keys[2], (*shape, num_derivatives)
            )

    def _spline(self, inputs, inverse=False):
        batch_size = inputs.shape[0]
        w = _share_across_batch(self.unnormalized_widths, batch_size)
        h = _share_across_batch(self.unnormalized_heights, batch_size)
        d = _share_across_batch(self.unnormalized_derivatives, batch_size)
        kwargs = {}
        if self.tails is None:
            spline_fn = splines.rational_quadratic_spline
        else:
            spline_fn = splines.unconstrained_rational_quadratic_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        outputs, logabsdet = spline_fn(
            inputs=inputs, unnormalized_widths=w, unnormalized_heights=h,
            unnormalized_derivatives=d, inverse=inverse,
            min_bin_width=self.min_bin_width, min_bin_height=self.min_bin_height,
            min_derivative=self.min_derivative, **kwargs,
        )
        return outputs, _sum(logabsdet)

    def forward(self, inputs, context=None):
        return self._spline(inputs, inverse=False)

    def inverse(self, inputs, context=None):
        return self._spline(inputs, inverse=True)
