"""Coupling layers (reference: nflows/transforms/coupling.py).

A coupling transform splits features (or image channels) by a fixed binary
mask: the identity half feeds a conditioner net whose output parameterizes
an elementwise bijection of the transform half. Supports NxD and NxCxHxW.

TPU-native notes: the reference scatters results back with boolean indexing
(coupling.py:96-98); here the split is a static gather and the re-merge is a
single static inverse-permutation gather on concat([identity, transform]) —
both constant-foldable layout ops under XLA, no scatter. The elementwise
spline/affine math is full-width VPU code that fuses with the conditioner's
final GEMM.
"""

from __future__ import annotations

import warnings
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import buffer, static
from nflows_tpu.ops import splines
from nflows_tpu.transforms.base import Transform
from nflows_tpu.utils import shapes as shapeutils

__all__ = [
    "CouplingTransform",
    "AffineCouplingTransform",
    "AdditiveCouplingTransform",
    "PiecewiseCouplingTransform",
    "PiecewiseLinearCouplingTransform",
    "PiecewiseQuadraticCouplingTransform",
    "PiecewiseCubicCouplingTransform",
    "PiecewiseRationalQuadraticCouplingTransform",
    "PiecewiseLinearRationalCouplingTransform",
    "UMNNCouplingTransform",
]


class CouplingTransform(Transform):
    """Base class for coupling layers (reference coupling.py:20-142).

    Args:
        mask: 1-dim array/list; ``mask[i] > 0`` means feature i is
            transformed, ``mask[i] <= 0`` means it passes through unchanged.
        transform_net_create_fn: callable (in_features, out_features) -> net.
        unconditional_transform: optional callable (features) -> Transform
            applied to the identity half.
    """

    transform_net: object
    unconditional_transform: Optional[Transform]
    identity_features: jnp.ndarray = buffer()
    transform_features: jnp.ndarray = buffer()
    inverse_permutation: jnp.ndarray = buffer()
    features: int = static()
    num_identity_features: int = static()
    num_transform_features: int = static()

    def __init__(self, mask, transform_net_create_fn, unconditional_transform=None):
        mask = np.asarray(mask)
        if mask.ndim != 1:
            raise ValueError("Mask must be a 1-dim tensor.")
        if mask.size <= 0:
            raise ValueError("Mask can't be empty.")

        self.features = len(mask)
        identity_idx = np.where(mask <= 0)[0]
        transform_idx = np.where(mask > 0)[0]
        self.num_identity_features = len(identity_idx)
        self.num_transform_features = len(transform_idx)
        assert self.num_identity_features + self.num_transform_features == self.features

        self.identity_features = jnp.asarray(identity_idx, dtype=jnp.int32)
        self.transform_features = jnp.asarray(transform_idx, dtype=jnp.int32)
        # concat([identity, transform]) indexed by this puts features back.
        self.inverse_permutation = jnp.asarray(
            np.argsort(np.concatenate([identity_idx, transform_idx])), dtype=jnp.int32
        )

        self.transform_net = transform_net_create_fn(
            self.num_identity_features,
            self.num_transform_features * self._transform_dim_multiplier(),
        )
        self.unconditional_transform = (
            unconditional_transform(features=self.num_identity_features)
            if unconditional_transform is not None else None
        )

    def _check(self, inputs):
        if inputs.ndim not in (2, 4):
            raise ValueError("Inputs must be a 2D or a 4D tensor.")
        if inputs.shape[1] != self.features:
            raise ValueError(
                f"Expected features = {self.features}, got {inputs.shape[1]}."
            )

    def _merge(self, identity_split, transform_split):
        both = jnp.concatenate([identity_split, transform_split], axis=1)
        return jnp.take(both, self.inverse_permutation, axis=1)

    def forward(self, inputs, context=None):
        self._check(inputs)
        identity_split = jnp.take(inputs, self.identity_features, axis=1)
        transform_split = jnp.take(inputs, self.transform_features, axis=1)

        transform_params = self.transform_net(identity_split, context)
        transform_split, logabsdet = self._coupling_transform_forward(
            transform_split, transform_params
        )

        if self.unconditional_transform is not None:
            identity_split, logabsdet_identity = self.unconditional_transform.forward(
                identity_split, context
            )
            logabsdet = logabsdet + logabsdet_identity

        return self._merge(identity_split, transform_split), logabsdet

    def inverse(self, inputs, context=None):
        self._check(inputs)
        identity_split = jnp.take(inputs, self.identity_features, axis=1)
        transform_split = jnp.take(inputs, self.transform_features, axis=1)

        logabsdet = jnp.zeros(inputs.shape[0], dtype=inputs.dtype)
        if self.unconditional_transform is not None:
            identity_split, logabsdet = self.unconditional_transform.inverse(
                identity_split, context
            )

        transform_params = self.transform_net(identity_split, context)
        transform_split, logabsdet_split = self._coupling_transform_inverse(
            transform_split, transform_params
        )
        logabsdet = logabsdet + logabsdet_split

        return self._merge(identity_split, transform_split), logabsdet

    def _transform_dim_multiplier(self):
        raise NotImplementedError()

    def _coupling_transform_forward(self, inputs, transform_params):
        raise NotImplementedError()

    def _coupling_transform_inverse(self, inputs, transform_params):
        raise NotImplementedError()


def _default_scale_activation(x):
    """sigmoid(x + 2) + 1e-3, scales in (1e-3, 1.001) (reference coupling.py:224)."""
    return jax.nn.sigmoid(x + 2.0) + 1e-3


def _general_scale_activation(x):
    """clamped softplus, scales in (1e-3, 3) (reference coupling.py:225)."""
    return jnp.clip(jnp.logaddexp(x, 0.0) + 1e-3, 0.0, 3.0)


class AffineCouplingTransform(CouplingTransform):
    """RealNVP scale-and-shift coupling (reference coupling.py:212-252)."""

    scale_activation: object = static()

    DEFAULT_SCALE_ACTIVATION = staticmethod(_default_scale_activation)
    GENERAL_SCALE_ACTIVATION = staticmethod(_general_scale_activation)

    def __init__(self, mask, transform_net_create_fn, unconditional_transform=None,
                 scale_activation=_default_scale_activation):
        self.scale_activation = scale_activation
        super().__init__(mask, transform_net_create_fn, unconditional_transform)

    def _transform_dim_multiplier(self):
        return 2

    def _scale_and_shift(self, transform_params):
        unconstrained_scale = transform_params[:, self.num_transform_features:, ...]
        shift = transform_params[:, : self.num_transform_features, ...]
        return self.scale_activation(unconstrained_scale), shift

    def _coupling_transform_forward(self, inputs, transform_params):
        scale, shift = self._scale_and_shift(transform_params)
        log_scale = jnp.log(scale)
        outputs = inputs * scale + shift
        return outputs, shapeutils.sum_except_batch(log_scale, num_batch_dims=1)

    def _coupling_transform_inverse(self, inputs, transform_params):
        scale, shift = self._scale_and_shift(transform_params)
        log_scale = jnp.log(scale)
        outputs = (inputs - shift) / scale
        return outputs, -shapeutils.sum_except_batch(log_scale, num_batch_dims=1)


class AdditiveCouplingTransform(AffineCouplingTransform):
    """NICE additive coupling: shift only, logdet 0
    (reference coupling.py:255-269)."""

    def _transform_dim_multiplier(self):
        return 1

    def _scale_and_shift(self, transform_params):
        return jnp.ones_like(transform_params), transform_params


class PiecewiseCouplingTransform(CouplingTransform):
    """Shared param-reshaping for spline couplings (reference coupling.py:272-296)."""

    def _coupling_transform_forward(self, inputs, transform_params):
        return self._coupling_transform(inputs, transform_params, inverse=False)

    def _coupling_transform_inverse(self, inputs, transform_params):
        return self._coupling_transform(inputs, transform_params, inverse=True)

    def _coupling_transform(self, inputs, transform_params, inverse=False):
        if inputs.ndim == 4:
            b, c, h, w = inputs.shape
            # Bx(C*M)xHxW -> BxCxHxWxM
            transform_params = transform_params.reshape(b, c, -1, h, w).transpose(
                0, 1, 3, 4, 2
            )
        elif inputs.ndim == 2:
            b, d = inputs.shape
            transform_params = transform_params.reshape(b, d, -1)

        outputs, logabsdet = self._piecewise_cdf(inputs, transform_params, inverse)
        return outputs, shapeutils.sum_except_batch(logabsdet)

    def _piecewise_cdf(self, inputs, transform_params, inverse=False):
        raise NotImplementedError()

    def _softmax_rescale(self, *param_groups, include_channels=False):
        """Divide softmax inputs by sqrt(hidden) for init quality.

        Reference parity: quadratic/cubic couplings scale only when the net
        has ``hidden_features`` (reference coupling.py:407-409, 478-480);
        only the RQ coupling also falls back to ``hidden_channels`` and
        warns otherwise (coupling.py:554-563) — pass
        ``include_channels=True`` for that variant.
        """
        net = self.transform_net
        if hasattr(net, "hidden_features"):
            s = 1.0 / np.sqrt(net.hidden_features)
        elif include_channels and hasattr(net, "hidden_channels"):
            s = 1.0 / np.sqrt(net.hidden_channels)
        elif include_channels:
            warnings.warn(
                "Inputs to the softmax are not scaled down: initialization might be bad."
            )
            s = 1.0
        else:
            s = 1.0
        return tuple(p * s for p in param_groups)


class PiecewiseLinearCouplingTransform(PiecewiseCouplingTransform):
    """Linear-spline coupling (Müller et al. 2018; reference coupling.py:299-352)."""

    num_bins: int = static()
    tails: object = static()
    tail_bound: float = static()

    def __init__(self, mask, transform_net_create_fn, num_bins=10, tails=None,
                 tail_bound=1.0, apply_unconditional_transform=False, img_shape=None):
        self.num_bins = num_bins
        self.tails = tails
        self.tail_bound = tail_bound

        if apply_unconditional_transform:
            from nflows_tpu.transforms.nonlinearities import PiecewiseLinearCDF
            unconditional_transform = lambda features: PiecewiseLinearCDF(
                shape=[features] + (list(img_shape) if img_shape else []),
                num_bins=num_bins, tails=tails, tail_bound=tail_bound,
            )
        else:
            unconditional_transform = None
        super().__init__(mask, transform_net_create_fn, unconditional_transform)

    def _transform_dim_multiplier(self):
        return self.num_bins

    def _piecewise_cdf(self, inputs, transform_params, inverse=False):
        if self.tails is None:
            return splines.linear_spline(
                inputs=inputs, unnormalized_pdf=transform_params, inverse=inverse
            )
        return splines.unconstrained_linear_spline(
            inputs=inputs, unnormalized_pdf=transform_params, inverse=inverse,
            tails=self.tails, tail_bound=self.tail_bound,
        )


class PiecewiseQuadraticCouplingTransform(PiecewiseCouplingTransform):
    """Quadratic-spline coupling (Müller et al. 2018; reference coupling.py:355-426)."""

    num_bins: int = static()
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()

    def __init__(self, mask, transform_net_create_fn, num_bins=10, tails=None,
                 tail_bound=1.0, apply_unconditional_transform=False, img_shape=None,
                 min_bin_width=splines.quadratic.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.quadratic.DEFAULT_MIN_BIN_HEIGHT):
        self.num_bins = num_bins
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height

        if apply_unconditional_transform:
            from nflows_tpu.transforms.nonlinearities import PiecewiseQuadraticCDF
            unconditional_transform = lambda features: PiecewiseQuadraticCDF(
                shape=[features] + (list(img_shape) if img_shape else []),
                num_bins=num_bins, tails=tails, tail_bound=tail_bound,
                min_bin_width=min_bin_width, min_bin_height=min_bin_height,
            )
        else:
            unconditional_transform = None
        super().__init__(mask, transform_net_create_fn, unconditional_transform)

    def _transform_dim_multiplier(self):
        if self.tails == "linear":
            return self.num_bins * 2 - 1
        return self.num_bins * 2 + 1

    def _piecewise_cdf(self, inputs, transform_params, inverse=False):
        unnormalized_widths = transform_params[..., : self.num_bins]
        unnormalized_heights = transform_params[..., self.num_bins:]
        unnormalized_widths, unnormalized_heights = self._softmax_rescale(
            unnormalized_widths, unnormalized_heights
        )
        kwargs = {}
        if self.tails is None:
            spline_fn = splines.quadratic_spline
        else:
            spline_fn = splines.unconstrained_quadratic_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        return spline_fn(
            inputs=inputs,
            unnormalized_widths=unnormalized_widths,
            unnormalized_heights=unnormalized_heights,
            inverse=inverse,
            min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height,
            **kwargs,
        )


class PiecewiseCubicCouplingTransform(PiecewiseCouplingTransform):
    """Cubic-spline coupling (reference coupling.py:429-499)."""

    num_bins: int = static()
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()

    def __init__(self, mask, transform_net_create_fn, num_bins=10, tails=None,
                 tail_bound=1.0, apply_unconditional_transform=False, img_shape=None,
                 min_bin_width=splines.cubic.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.cubic.DEFAULT_MIN_BIN_HEIGHT):
        self.num_bins = num_bins
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height

        if apply_unconditional_transform:
            from nflows_tpu.transforms.nonlinearities import PiecewiseCubicCDF
            unconditional_transform = lambda features: PiecewiseCubicCDF(
                shape=[features] + (list(img_shape) if img_shape else []),
                num_bins=num_bins, tails=tails, tail_bound=tail_bound,
                min_bin_width=min_bin_width, min_bin_height=min_bin_height,
            )
        else:
            unconditional_transform = None
        super().__init__(mask, transform_net_create_fn, unconditional_transform)

    def _transform_dim_multiplier(self):
        return self.num_bins * 2 + 2

    def _piecewise_cdf(self, inputs, transform_params, inverse=False):
        unnormalized_widths = transform_params[..., : self.num_bins]
        unnormalized_heights = transform_params[..., self.num_bins: 2 * self.num_bins]
        unnorm_derivatives_left = transform_params[..., 2 * self.num_bins][..., None]
        unnorm_derivatives_right = transform_params[..., 2 * self.num_bins + 1][..., None]
        unnormalized_widths, unnormalized_heights = self._softmax_rescale(
            unnormalized_widths, unnormalized_heights
        )
        kwargs = {}
        if self.tails is None:
            spline_fn = splines.cubic_spline
        else:
            spline_fn = splines.unconstrained_cubic_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        return spline_fn(
            inputs=inputs,
            unnormalized_widths=unnormalized_widths,
            unnormalized_heights=unnormalized_heights,
            unnorm_derivatives_left=unnorm_derivatives_left,
            unnorm_derivatives_right=unnorm_derivatives_right,
            inverse=inverse,
            min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height,
            **kwargs,
        )


class PiecewiseRationalQuadraticCouplingTransform(PiecewiseCouplingTransform):
    """RQ-spline coupling — the NSF flagship (reference coupling.py:502-582)."""

    num_bins: int = static()
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()
    min_derivative: float = static()

    def __init__(self, mask, transform_net_create_fn, num_bins=10, tails=None,
                 tail_bound=1.0, apply_unconditional_transform=False, img_shape=None,
                 min_bin_width=splines.rational_quadratic.DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height=splines.rational_quadratic.DEFAULT_MIN_BIN_HEIGHT,
                 min_derivative=splines.rational_quadratic.DEFAULT_MIN_DERIVATIVE):
        self.num_bins = num_bins
        self.tails = tails
        self.tail_bound = tail_bound
        self.min_bin_width = min_bin_width
        self.min_bin_height = min_bin_height
        self.min_derivative = min_derivative

        if apply_unconditional_transform:
            from nflows_tpu.transforms.nonlinearities import PiecewiseRationalQuadraticCDF
            unconditional_transform = lambda features: PiecewiseRationalQuadraticCDF(
                shape=[features] + (list(img_shape) if img_shape else []),
                num_bins=num_bins, tails=tails, tail_bound=tail_bound,
                min_bin_width=min_bin_width, min_bin_height=min_bin_height,
                min_derivative=min_derivative,
            )
        else:
            unconditional_transform = None
        super().__init__(mask, transform_net_create_fn, unconditional_transform)

    def _transform_dim_multiplier(self):
        if self.tails == "linear":
            return self.num_bins * 3 - 1
        return self.num_bins * 3 + 1

    def _piecewise_cdf(self, inputs, transform_params, inverse=False):
        unnormalized_widths = transform_params[..., : self.num_bins]
        unnormalized_heights = transform_params[..., self.num_bins: 2 * self.num_bins]
        unnormalized_derivatives = transform_params[..., 2 * self.num_bins:]
        unnormalized_widths, unnormalized_heights = self._softmax_rescale(
            unnormalized_widths, unnormalized_heights, include_channels=True
        )
        kwargs = {}
        if self.tails is None:
            spline_fn = splines.rational_quadratic_spline
        else:
            spline_fn = splines.unconstrained_rational_quadratic_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        return spline_fn(
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


class PiecewiseLinearRationalCouplingTransform(PiecewiseCouplingTransform):
    """Linear-rational-spline coupling (Dolatabadi et al. 2020,
    arXiv:2001.05168) — a transform family BEYOND the reference library.
    Same contract as the RQ coupling, with an extra per-bin split-point
    parameter lambda and an analytic *linear* inverse
    (ops/splines/linear_rational.py)."""

    num_bins: int = static()
    tails: object = static()
    tail_bound: float = static()
    min_bin_width: float = static()
    min_bin_height: float = static()
    min_derivative: float = static()
    min_lambda: float = static()

    def __init__(self, mask, transform_net_create_fn, num_bins=10, tails=None,
                 tail_bound=1.0, apply_unconditional_transform=False,
                 img_shape=None,
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

        if apply_unconditional_transform:
            from nflows_tpu.transforms.nonlinearities import (
                PiecewiseLinearRationalCDF,
            )
            unconditional_transform = lambda features: PiecewiseLinearRationalCDF(
                shape=[features] + (list(img_shape) if img_shape else []),
                num_bins=num_bins, tails=tails, tail_bound=tail_bound,
                min_bin_width=min_bin_width, min_bin_height=min_bin_height,
                min_derivative=min_derivative, min_lambda=min_lambda,
            )
        else:
            unconditional_transform = None
        super().__init__(mask, transform_net_create_fn,
                         unconditional_transform=unconditional_transform)

    def _transform_dim_multiplier(self):
        # widths K + heights K + lambdas K + derivatives (K-1 | K+1)
        if self.tails == "linear":
            return self.num_bins * 4 - 1
        return self.num_bins * 4 + 1

    def _piecewise_cdf(self, inputs, transform_params, inverse=False):
        K = self.num_bins
        unnormalized_widths = transform_params[..., :K]
        unnormalized_heights = transform_params[..., K: 2 * K]
        unnormalized_lambdas = transform_params[..., 2 * K: 3 * K]
        unnormalized_derivatives = transform_params[..., 3 * K:]
        unnormalized_widths, unnormalized_heights = self._softmax_rescale(
            unnormalized_widths, unnormalized_heights
        )
        kwargs = {}
        if self.tails is None:
            spline_fn = splines.linear_rational_spline
        else:
            spline_fn = splines.unconstrained_linear_rational_spline
            kwargs = {"tails": self.tails, "tail_bound": self.tail_bound}
        return spline_fn(
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


class UMNNCouplingTransform(CouplingTransform):
    """Unconstrained monotonic neural network coupling
    (reference coupling.py:145-209; Wehenkel & Louppe, NeurIPS 2019).

    The conditioner emits a ``cond_size`` embedding per transformed feature;
    the shared MonotonicNormalizer integrates a positive integrand net via
    native Clenshaw–Curtis quadrature (see transforms/umnn.py).
    """

    transformer: object
    cond_size: int = static()

    def __init__(self, mask, transform_net_create_fn,
                 integrand_net_layers=(50, 50, 50), cond_size=20, nb_steps=20,
                 solver="CCParallel", apply_unconditional_transform=False,
                 key=None):
        from nflows_tpu.transforms.umnn import MonotonicNormalizer
        if apply_unconditional_transform:
            # a cond_size=0 MonotonicNormalizer on the identity half — the
            # reference's configuration (coupling.py:171-173), packaged as a
            # proper Transform (umnn.py:UnconditionalMonotonicTransform)
            from nflows_tpu.transforms.umnn import (
                UnconditionalMonotonicTransform,
            )
            unconditional_transform = lambda features: (
                UnconditionalMonotonicTransform(
                    features, integrand_net_layers=integrand_net_layers,
                    nb_steps=nb_steps, solver=solver, key=key))
        else:
            unconditional_transform = None
        self.cond_size = cond_size
        super().__init__(mask, transform_net_create_fn,
                         unconditional_transform=unconditional_transform)
        self.transformer = MonotonicNormalizer(
            list(integrand_net_layers), cond_size, nb_steps, solver, key=key
        )

    def _transform_dim_multiplier(self):
        return self.cond_size

    def _reshape_params(self, inputs, transform_params):
        if inputs.ndim == 2:
            return transform_params.reshape(
                inputs.shape[0], inputs.shape[1], -1
            )
        raise NotImplementedError  # image path handled in callers

    def _image_params(self, c, transform_params):
        """[B, c*cond, H, W] -> per-pixel [B*H*W, c, cond], feature-major —
        the same convention as the 2D path. (The reference's 4D path instead
        passes [N, 1, c*cond] and lets MonotonicNormalizer reinterpret it
        param-major with a z0 offset shared across channels,
        coupling.py:196-198 + UMNN/MonotonicNormalizer.py:52-54 — an
        inconsistency with its own 2D path that we deliberately do not
        reproduce.)"""
        return transform_params.transpose(0, 2, 3, 1).reshape(
            -1, c, self.cond_size)

    def _coupling_transform_forward(self, inputs, transform_params):
        if inputs.ndim == 2:
            z, jac = self.transformer.forward(
                inputs, self._reshape_params(inputs, transform_params)
            )
            return z, jnp.sum(jnp.log(jac), axis=1)
        b, c, h, w = inputs.shape
        flat_x = inputs.transpose(0, 2, 3, 1).reshape(-1, c)
        flat_h = self._image_params(c, transform_params)
        z, jac = self.transformer.forward(flat_x, flat_h)
        log_det = jnp.sum(jnp.log(jac).reshape(b, -1), axis=1)
        return z.reshape(b, h, w, c).transpose(0, 3, 1, 2), log_det

    def _coupling_transform_inverse(self, inputs, transform_params):
        if inputs.ndim == 2:
            params = self._reshape_params(inputs, transform_params)
            x = self.transformer.inverse_transform(inputs, params)
            _, jac = self.transformer.forward(x, params)
            return x, -jnp.sum(jnp.log(jac), axis=1)
        b, c, h, w = inputs.shape
        flat_z = inputs.transpose(0, 2, 3, 1).reshape(-1, c)
        flat_h = self._image_params(c, transform_params)
        x = self.transformer.inverse_transform(flat_z, flat_h)
        _, jac = self.transformer.forward(x, flat_h)
        log_det = -jnp.sum(jnp.log(jac).reshape(b, -1), axis=1)
        return x.reshape(b, h, w, c).transpose(0, 3, 1, 2), log_det
