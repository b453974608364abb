"""Masked autoregressive transforms (reference: nflows/transforms/autoregressive.py).

Forward (density direction) is one MADE pass — fully parallel over features.
Inverse is inherently sequential: feature k needs features < k already
inverted. The reference runs a Python loop of D full MADE passes
(autoregressive.py:43-52); here the same fixed-point iteration is a
``lax.fori_loop`` so the compiled program is one XLA while-loop of fused
MADE steps — no per-step dispatch overhead, flat memory.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.nn import made as made_module
from nflows_tpu.ops import splines
from nflows_tpu.transforms.base import Transform
from nflows_tpu.utils import shapes as shapeutils

__all__ = [
    "AutoregressiveTransform",
    "MaskedAffineAutoregressiveTransform",
    "MaskedPiecewiseLinearAutoregressiveTransform",
    "MaskedPiecewiseQuadraticAutoregressiveTransform",
    "MaskedPiecewiseCubicAutoregressiveTransform",
    "MaskedPiecewiseRationalQuadraticAutoregressiveTransform",
    "MaskedPiecewiseLinearRationalAutoregressiveTransform",
    "MaskedUMNNAutoregressiveTransform",
]


class AutoregressiveTransform(Transform):
    """Elementwise transform whose parameters come from an autoregressive net
    (reference autoregressive.py:24-61).

    NOTE: the inverse costs D forward passes of the conditioner.
    """

    autoregressive_net: object

    def __init__(self, autoregressive_net):
        self.autoregressive_net = autoregressive_net

    def forward(self, inputs, context=None):
        autoregressive_params = self.autoregressive_net(inputs, context)
        outputs, logabsdet = self._elementwise_forward(inputs, autoregressive_params)
        return outputs, logabsdet

    def inverse(self, inputs, context=None):
        num_inputs = int(np.prod(inputs.shape[1:]))

        def body(_, carry):
            outputs, _ = carry
            autoregressive_params = self.autoregressive_net(outputs, context)
            return self._elementwise_inverse(inputs, autoregressive_params)

        init = (jnp.zeros_like(inputs), jnp.zeros(inputs.shape[0], dtype=inputs.dtype))
        outputs, logabsdet = jax.lax.fori_loop(0, num_inputs, body, init)
        return outputs, logabsdet

    def _output_dim_multiplier(self):
        raise NotImplementedError()

    def _elementwise_forward(self, inputs, autoregressive_params):
        raise NotImplementedError()

    def _elementwise_inverse(self, inputs, autoregressive_params):
        raise NotImplementedError()


class MaskedAffineAutoregressiveTransform(AutoregressiveTransform):
    """MAF affine transform: softplus scale (reference autoregressive.py:64-128)."""

    features: int = static()

    def __init__(self, features, hidden_features, context_features=None,
                 num_blocks=2, use_residual_blocks=True, random_mask=False,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False):
        self.features = features
        super().__init__(_build_made(
            features, hidden_features, context_features, num_blocks,
            self._output_dim_multiplier(), use_residual_blocks, random_mask,
            key, activation, dropout_probability, use_batch_norm,
        ))

    _EPSILON = 1e-3

    def _output_dim_multiplier(self):
        return 2

    def _unconstrained_scale_and_shift(self, autoregressive_params):
        params = autoregressive_params.reshape(
            -1, self.features, self._output_dim_multiplier()
        )
        return params[..., 0], params[..., 1]

    def _elementwise_forward(self, inputs, autoregressive_params):
        unconstrained_scale, shift = self._unconstrained_scale_and_shift(
            autoregressive_params
        )
        scale = jnp.logaddexp(unconstrained_scale, 0.0) + self._EPSILON
        log_scale = jnp.log(scale)
        outputs = scale * inputs + shift
        return outputs, shapeutils.sum_except_batch(log_scale, num_batch_dims=1)

    def _elementwise_inverse(self, inputs, autoregressive_params):
        unconstrained_scale, shift = self._unconstrained_scale_and_shift(
            autoregressive_params
        )
        scale = jnp.logaddexp(unconstrained_scale, 0.0) + self._EPSILON
        log_scale = jnp.log(scale)
        outputs = (inputs - shift) / scale
        return outputs, -shapeutils.sum_except_batch(log_scale, num_batch_dims=1)


class _MaskedPiecewiseAutoregressive(AutoregressiveTransform):
    """Shared reshape logic for spline AR transforms."""

    features: int = static()

    def _reshape_params(self, inputs, autoregressive_params):
        batch_size = inputs.shape[0]
        return autoregressive_params.reshape(
            batch_size, self.features, self._output_dim_multiplier()
        )

    def _hidden_scale(self):
        if hasattr(self.autoregressive_net, "hidden_features"):
            return 1.0 / np.sqrt(self.autoregressive_net.hidden_features)
        return 1.0

    def _elementwise_forward(self, inputs, autoregressive_params):
        return self._elementwise(inputs, autoregressive_params, inverse=False)

    def _elementwise_inverse(self, inputs, autoregressive_params):
        return self._elementwise(inputs, autoregressive_params, inverse=True)


def _build_made(features, hidden_features, context_features, num_blocks,
                output_multiplier, use_residual_blocks, random_mask, key,
                activation, dropout_probability, use_batch_norm):
    return made_module.MADE(
        features=features,
        hidden_features=hidden_features,
        context_features=context_features,
        num_blocks=num_blocks,
        output_multiplier=output_multiplier,
        use_residual_blocks=use_residual_blocks,
        random_mask=random_mask,
        key=key,
        activation=activation,
        dropout_probability=dropout_probability,
        use_batch_norm=use_batch_norm,
    )


class MaskedPiecewiseLinearAutoregressiveTransform(_MaskedPiecewiseAutoregressive):
    """Linear-spline AR transform (reference autoregressive.py:196-246)."""

    num_bins: int = static()

    def __init__(self, num_bins, features, hidden_features, context_features=None,
                 num_blocks=2, use_residual_blocks=True, random_mask=False,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False):
        self.num_bins = num_bins
        self.features = features
        super().__init__(_build_made(
            features, hidden_features, context_features, num_blocks,
            self._output_dim_multiplier(), use_residual_blocks, random_mask,
            key, activation, dropout_probability, use_batch_norm,
        ))

    def _output_dim_multiplier(self):
        return self.num_bins

    def _elementwise(self, inputs, autoregressive_params, inverse=False):
        unnormalized_pdf = self._reshape_params(inputs, autoregressive_params)
        outputs, logabsdet = splines.linear_spline(
            inputs=inputs, unnormalized_pdf=unnormalized_pdf, inverse=inverse
        )
        return outputs, shapeutils.sum_except_batch(logabsdet)


class MaskedPiecewiseQuadraticAutoregressiveTransform(_MaskedPiecewiseAutoregressive):
    """Quadratic-spline AR transform (reference autoregressive.py:249-334).
    Note: matching the reference, only the widths are sqrt(hidden)-rescaled
    (reference autoregressive.py:305-307)."""

    num_bins: int = static()
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()

    def __init__(self, features, hidden_features, context_features=None,
                 num_bins=10, num_blocks=2, tails=None, tail_bound=1.0,
                 use_residual_blocks=True, random_mask=False, key=None,
                 activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False,
                 min_bin_width=splines.quadratic.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.quadratic.DEFAULT_MIN_BIN_HEIGHT):
        self.num_bins = num_bins
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height
        self.features = features
        super().__init__(_build_made(
            features, hidden_features, context_features, num_blocks,
            self._output_dim_multiplier(), use_residual_blocks, random_mask,
            key, activation, dropout_probability, use_batch_norm,
        ))

    def _output_dim_multiplier(self):
        if self.tails == "linear":
            return self.num_bins * 2 - 1
        return self.num_bins * 2 + 1

    def _elementwise(self, inputs, autoregressive_params, inverse=False):
        transform_params = self._reshape_params(inputs, autoregressive_params)
        unnormalized_widths = transform_params[..., : self.num_bins] * self._hidden_scale()
        unnormalized_heights = transform_params[..., self.num_bins:]

        kwargs = {}
        if self.tails is None:
            spline_fn = splines.quadratic_spline
        elif self.tails == "linear":
            spline_fn = splines.unconstrained_quadratic_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        else:
            raise ValueError
        outputs, logabsdet = spline_fn(
            inputs=inputs,
            unnormalized_widths=unnormalized_widths,
            unnormalized_heights=unnormalized_heights,
            inverse=inverse,
            min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height,
            **kwargs,
        )
        return outputs, shapeutils.sum_except_batch(logabsdet)


class MaskedPiecewiseCubicAutoregressiveTransform(_MaskedPiecewiseAutoregressive):
    """Cubic-spline AR transform (reference autoregressive.py:337-401)."""

    num_bins: int = static()

    def __init__(self, num_bins, features, hidden_features, context_features=None,
                 num_blocks=2, use_residual_blocks=True, random_mask=False,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False):
        self.num_bins = num_bins
        self.features = features
        super().__init__(_build_made(
            features, hidden_features, context_features, num_blocks,
            self._output_dim_multiplier(), use_residual_blocks, random_mask,
            key, activation, dropout_probability, use_batch_norm,
        ))

    def _output_dim_multiplier(self):
        return self.num_bins * 2 + 2

    def _elementwise(self, inputs, autoregressive_params, inverse=False):
        transform_params = self._reshape_params(inputs, autoregressive_params)
        s = self._hidden_scale()
        unnormalized_widths = transform_params[..., : self.num_bins] * s
        unnormalized_heights = transform_params[..., self.num_bins: 2 * self.num_bins] * s
        derivatives = transform_params[..., 2 * self.num_bins:]
        unnorm_derivatives_left = derivatives[..., 0][..., None]
        unnorm_derivatives_right = derivatives[..., 1][..., None]

        outputs, logabsdet = splines.cubic_spline(
            inputs=inputs,
            unnormalized_widths=unnormalized_widths,
            unnormalized_heights=unnormalized_heights,
            unnorm_derivatives_left=unnorm_derivatives_left,
            unnorm_derivatives_right=unnorm_derivatives_right,
            inverse=inverse,
        )
        return outputs, shapeutils.sum_except_batch(logabsdet)


class MaskedPiecewiseRationalQuadraticAutoregressiveTransform(_MaskedPiecewiseAutoregressive):
    """RQ-spline AR transform — NSF-AR (reference autoregressive.py:404-495)."""

    num_bins: int = static()
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()
    min_derivative: float = static()

    def __init__(self, features, hidden_features, context_features=None,
                 num_bins=10, tails=None, tail_bound=1.0, num_blocks=2,
                 use_residual_blocks=True, random_mask=False, key=None,
                 activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False,
                 min_bin_width=splines.rational_quadratic.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.rational_quadratic.DEFAULT_MIN_BIN_HEIGHT,
                 min_derivative=splines.rational_quadratic.DEFAULT_MIN_DERIVATIVE):
        self.num_bins = num_bins
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height
        self.min_derivative = min_derivative
        self.features = features
        super().__init__(_build_made(
            features, hidden_features, context_features, num_blocks,
            self._output_dim_multiplier(), use_residual_blocks, random_mask,
            key, activation, dropout_probability, use_batch_norm,
        ))

    def _output_dim_multiplier(self):
        if self.tails == "linear":
            return self.num_bins * 3 - 1
        elif self.tails is None:
            return self.num_bins * 3 + 1
        raise ValueError

    def _elementwise(self, inputs, autoregressive_params, inverse=False):
        transform_params = self._reshape_params(inputs, autoregressive_params)
        s = self._hidden_scale()
        unnormalized_widths = transform_params[..., : self.num_bins] * s
        unnormalized_heights = transform_params[..., self.num_bins: 2 * self.num_bins] * s
        unnormalized_derivatives = transform_params[..., 2 * self.num_bins:]

        kwargs = {}
        if self.tails is None:
            spline_fn = splines.rational_quadratic_spline
        elif self.tails == "linear":
            spline_fn = splines.unconstrained_rational_quadratic_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        else:
            raise ValueError
        outputs, logabsdet = spline_fn(
            inputs=inputs,
            unnormalized_widths=unnormalized_widths,
            unnormalized_heights=unnormalized_heights,
            unnormalized_derivatives=unnormalized_derivatives,
            inverse=inverse,
            min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height,
            min_derivative=self.min_derivative,
            **kwargs,
        )
        return outputs, shapeutils.sum_except_batch(logabsdet)


class MaskedPiecewiseLinearRationalAutoregressiveTransform(_MaskedPiecewiseAutoregressive):
    """Linear-rational-spline AR transform (Dolatabadi et al. 2020,
    arXiv:2001.05168) — beyond the reference library. Analytic linear
    inverse per step; the ancestral inverse is still D sequential passes."""

    num_bins: int = static()
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()
    min_derivative: float = static()
    min_lambda: float = static()

    def __init__(self, features, hidden_features, context_features=None,
                 num_bins=10, tails=None, tail_bound=1.0, num_blocks=2,
                 use_residual_blocks=True, random_mask=False, key=None,
                 activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False,
                 min_bin_width=splines.linear_rational.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.linear_rational.DEFAULT_MIN_BIN_HEIGHT,
                 min_derivative=splines.linear_rational.DEFAULT_MIN_DERIVATIVE,
                 min_lambda=splines.linear_rational.DEFAULT_MIN_LAMBDA):
        self.num_bins = num_bins
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height
        self.min_derivative = min_derivative
        self.min_lambda = min_lambda
        self.features = features
        super().__init__(_build_made(
            features, hidden_features, context_features, num_blocks,
            self._output_dim_multiplier(), use_residual_blocks, random_mask,
            key, activation, dropout_probability, use_batch_norm,
        ))

    def _output_dim_multiplier(self):
        if self.tails == "linear":
            return self.num_bins * 4 - 1
        elif self.tails is None:
            return self.num_bins * 4 + 1
        raise ValueError

    def _elementwise(self, inputs, autoregressive_params, inverse=False):
        transform_params = self._reshape_params(inputs, autoregressive_params)
        K = self.num_bins
        s = self._hidden_scale()
        unnormalized_widths = transform_params[..., :K] * s
        unnormalized_heights = transform_params[..., K: 2 * K] * s
        unnormalized_lambdas = transform_params[..., 2 * K: 3 * K]
        unnormalized_derivatives = transform_params[..., 3 * K:]

        kwargs = {}
        if self.tails is None:
            spline_fn = splines.linear_rational_spline
        elif self.tails == "linear":
            spline_fn = splines.unconstrained_linear_rational_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        else:
            raise ValueError
        outputs, logabsdet = spline_fn(
            inputs=inputs,
            unnormalized_widths=unnormalized_widths,
            unnormalized_heights=unnormalized_heights,
            unnormalized_derivatives=unnormalized_derivatives,
            unnormalized_lambdas=unnormalized_lambdas,
            inverse=inverse,
            min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height,
            min_derivative=self.min_derivative,
            min_lambda=self.min_lambda,
            **kwargs,
        )
        return outputs, shapeutils.sum_except_batch(logabsdet)


class MaskedUMNNAutoregressiveTransform(AutoregressiveTransform):
    """UMNN autoregressive transform (reference autoregressive.py:131-192):
    MADE emits a ``cond_size`` embedding per feature; the shared
    MonotonicNormalizer integrates natively (transforms/umnn.py)."""

    features: int = static()
    cond_size: int = static()
    transformer: object

    def __init__(self, features, hidden_features, context_features=None,
                 num_blocks=2, use_residual_blocks=True, random_mask=False,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False, integrand_net_layers=(50, 50, 50),
                 cond_size=20, nb_steps=20, solver="CCParallel"):
        from nflows_tpu.transforms.umnn import MonotonicNormalizer
        from nflows_tpu.nn.primitives import ensure_key
        key = ensure_key(key)
        made_key, t_key = jax.random.split(key)
        self.features = features
        self.cond_size = cond_size
        made = _build_made(
            features, hidden_features, context_features, num_blocks,
            self._output_dim_multiplier(), use_residual_blocks, random_mask,
            made_key, activation, dropout_probability, use_batch_norm,
        )
        super().__init__(made)
        self.transformer = MonotonicNormalizer(
            list(integrand_net_layers), cond_size, nb_steps, solver, key=t_key
        )

    def _output_dim_multiplier(self):
        return self.cond_size

    def _elementwise_forward(self, inputs, autoregressive_params):
        h = autoregressive_params.reshape(inputs.shape[0], inputs.shape[1], -1)
        z, jac = self.transformer.forward(inputs, h)
        return z, jnp.sum(jnp.log(jac), axis=1)

    def _elementwise_inverse(self, inputs, autoregressive_params):
        h = autoregressive_params.reshape(inputs.shape[0], inputs.shape[1], -1)
        x = self.transformer.inverse_transform(inputs, h)
        _, jac = self.transformer.forward(x, h)
        return x, -jnp.sum(jnp.log(jac), axis=1)
