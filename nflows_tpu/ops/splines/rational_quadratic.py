"""Monotonic rational-quadratic spline (Neural Spline Flows).

Numerically equivalent to the reference
(nflows/transforms/splines/rational_quadratic.py:13-181) but restructured
for XLA: no boolean-mask compression, no in-place scatter — every element
computes both the interior spline and the identity tail, selected with
``jnp.where`` (full-width select is free on the VPU, and static shapes keep
the whole kernel one fused loop nest). Bin lookup uses one-hot
multiply-reduce (see ops/binning.py) instead of searchsorted+gather.

Out-of-domain inputs to the *constrained* spline clamp to the boundary
instead of raising (no exceptions inside jit); the unconstrained/linear-tail
variant is exact by construction.

The quadratic-root inverse uses the cancellation-stable form
``2c / (-b - sqrt(b² - 4ac))``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from nflows_tpu.ops import binning

__all__ = [
    "rational_quadratic_spline",
    "unconstrained_rational_quadratic_spline",
    "DEFAULT_MIN_BIN_WIDTH",
    "DEFAULT_MIN_BIN_HEIGHT",
    "DEFAULT_MIN_DERIVATIVE",
]

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _softplus(x, beta=1.0):
    if beta == 1.0:
        return jnp.logaddexp(x, 0.0)
    return jnp.logaddexp(beta * x, 0.0) / beta


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    enable_identity_init: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RQ spline on [left,right] -> [bottom,top]; K+1 derivative params.

    inputs [...]; widths/heights [..., K]; derivatives [..., K+1].
    Returns (outputs [...], logabsdet [...]) — per-element logabsdet.
    """
    num_bins = unnormalized_widths.shape[-1]
    if min_bin_width * num_bins > 1.0:
        raise ValueError("Minimal bin width too large for the number of bins")
    if min_bin_height * num_bins > 1.0:
        raise ValueError("Minimal bin height too large for the number of bins")

    # Clamp into the closed domain (reference raises InputOutsideDomain).
    if inverse:
        inputs = jnp.clip(inputs, bottom, top)
    else:
        inputs = jnp.clip(inputs, left, right)

    widths = binning.normalize_bins(unnormalized_widths, num_bins, min_bin_width)
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = binning.pad_zero_left(cumwidths)
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    # beta chosen so zero params give the identity map (reference rq.py:100-104)
    beta = float(np.log(2.0) / (1.0 - min_derivative)) if enable_identity_init else 1.0
    derivatives = min_derivative + _softplus(unnormalized_derivatives, beta=beta)

    heights = binning.normalize_bins(unnormalized_heights, num_bins, min_bin_height)
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = binning.pad_zero_left(cumheights)
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        onehot, _ = binning.bin_onehot(cumheights, inputs)
    else:
        onehot, _ = binning.bin_onehot(cumwidths, inputs)

    input_cumwidths = binning.select_bin(cumwidths[..., :-1], onehot)
    input_bin_widths = binning.select_bin(widths, onehot)
    input_cumheights = binning.select_bin(cumheights[..., :-1], onehot)
    delta = heights / widths
    input_delta = binning.select_bin(delta, onehot)
    # Only entries 0..K are reachable by the bin index — the reference's
    # gather semantics (rational_quadratic.py:127-128), which silently
    # tolerates over-length derivative vectors.
    input_derivatives = binning.select_bin(derivatives[..., :num_bins], onehot)
    input_derivatives_plus_one = binning.select_bin(
        derivatives[..., 1:num_bins + 1], onehot)
    input_heights = binning.select_bin(heights, onehot)

    d_sum = input_derivatives + input_derivatives_plus_one - 2 * input_delta

    if inverse:
        y_rel = inputs - input_cumheights
        a = y_rel * d_sum + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - y_rel * d_sum
        c = -input_delta * y_rel

        discriminant = b ** 2 - 4 * a * c
        discriminant = jnp.maximum(discriminant, 0.0)  # >=0 in exact arithmetic

        theta = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = theta * input_bin_widths + input_cumwidths

        theta_one_minus_theta = theta * (1 - theta)
        denominator = input_delta + d_sum * theta_one_minus_theta
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_plus_one * theta ** 2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, -logabsdet
    else:
        theta = (inputs - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)

        numerator = input_heights * (
            input_delta * theta ** 2 + input_derivatives * theta_one_minus_theta
        )
        denominator = input_delta + d_sum * theta_one_minus_theta
        outputs = input_cumheights + numerator / denominator

        derivative_numerator = input_delta ** 2 * (
            input_derivatives_plus_one * theta ** 2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tails: str = "linear",
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    enable_identity_init: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RQ spline on [-B, B] with identity (linear) tails outside
    (reference rational_quadratic.py:13-63). Derivative params are padded
    with the constant making boundary derivatives exactly 1.

    On TPU this dispatches to the fused Pallas kernel
    (ops/pallas/rq_spline.py) when the configuration allows — same
    numerics, single fused VMEM pass. Toggle with
    nflows_tpu.config.set_pallas_splines."""
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented.")

    if (
        not enable_identity_init
        and unnormalized_derivatives.shape[-1] == unnormalized_widths.shape[-1] - 1
    ):
        from nflows_tpu import config
        if config.use_pallas_splines():
            from nflows_tpu.ops.pallas.rq_spline import rq_spline_pallas
            return rq_spline_pallas(
                inputs, unnormalized_widths, unnormalized_heights,
                unnormalized_derivatives, inverse=inverse,
                tail_bound=tail_bound, min_bin_width=min_bin_width,
                min_bin_height=min_bin_height, min_derivative=min_derivative,
            )

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # Pad derivatives: boundary slots pinned so d(left)=d(right)=1.
    pad_widths = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(unnormalized_derivatives, pad_widths)
    constant = float(np.log(np.exp(1 - min_derivative) - 1))
    unnormalized_derivatives = unnormalized_derivatives.at[..., 0].set(constant)
    unnormalized_derivatives = unnormalized_derivatives.at[..., -1].set(constant)

    spline_out, spline_lad = rational_quadratic_spline(
        inputs=jnp.clip(inputs, -tail_bound, tail_bound),
        unnormalized_widths=unnormalized_widths,
        unnormalized_heights=unnormalized_heights,
        unnormalized_derivatives=unnormalized_derivatives,
        inverse=inverse,
        left=-tail_bound, right=tail_bound,
        bottom=-tail_bound, top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
        enable_identity_init=enable_identity_init,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_lad, jnp.zeros_like(spline_lad))
    return outputs, logabsdet
