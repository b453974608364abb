"""Piecewise-quadratic spline (Neural Importance Sampling, Müller et al. 2018).

Behavioral parity with reference nflows/transforms/splines/quadratic.py:55-159,
restructured full-width for XLA. The K-1-height variant (used with linear
tails) solves for the boundary heights that normalize to exactly 1 after the
trapezoid integral (reference quadratic.py:88-104).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from nflows_tpu.ops import binning

__all__ = [
    "quadratic_spline",
    "unconstrained_quadratic_spline",
    "DEFAULT_MIN_BIN_WIDTH",
    "DEFAULT_MIN_BIN_HEIGHT",
]

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3


def quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quadratic spline: pdf is piecewise-linear through K+1 knot heights,
    so the CDF is piecewise-quadratic.

    inputs [...]; widths [..., K]; heights [..., K+1] (or [..., K-1] for the
    normalized-boundary variant).
    """
    if inverse:
        inputs = jnp.clip(inputs, bottom, top)
        inputs = (inputs - bottom) / (top - bottom)
    else:
        inputs = jnp.clip(inputs, left, right)
        inputs = (inputs - left) / (right - left)

    num_bins = unnormalized_widths.shape[-1]
    if min_bin_width * num_bins > 1.0:
        raise ValueError("Minimal bin width too large for the number of bins")
    if min_bin_height * num_bins > 1.0:
        raise ValueError("Minimal bin height too large for the number of bins")

    widths = binning.normalize_bins(unnormalized_widths, num_bins, min_bin_width)

    unnorm_heights_exp = jnp.logaddexp(unnormalized_heights, 0.0) + 1e-3

    if unnorm_heights_exp.shape[-1] == num_bins - 1:
        # Solve for boundary heights that make the normalized heights exactly
        # 1 at both ends (reference quadratic.py:88-104).
        first_widths = 0.5 * widths[..., 0]
        last_widths = 0.5 * widths[..., -1]
        numerator = (
            0.5 * first_widths * unnorm_heights_exp[..., 0]
            + 0.5 * last_widths * unnorm_heights_exp[..., -1]
            + jnp.sum(
                ((unnorm_heights_exp[..., :-1] + unnorm_heights_exp[..., 1:]) / 2)
                * widths[..., 1:-1],
                axis=-1,
            )
        )
        constant = numerator / (1 - 0.5 * first_widths - 0.5 * last_widths)
        constant = constant[..., None]
        unnorm_heights_exp = jnp.concatenate(
            [constant, unnorm_heights_exp, constant], axis=-1
        )

    unnormalized_area = jnp.sum(
        ((unnorm_heights_exp[..., :-1] + unnorm_heights_exp[..., 1:]) / 2) * widths,
        axis=-1, keepdims=True,
    )
    heights = unnorm_heights_exp / unnormalized_area
    heights = min_bin_height + (1 - min_bin_height) * heights

    bin_left_cdf = jnp.cumsum(
        ((heights[..., :-1] + heights[..., 1:]) / 2) * widths, axis=-1
    )
    bin_left_cdf = bin_left_cdf.at[..., -1].set(1.0)
    bin_left_cdf = binning.pad_zero_left(bin_left_cdf)

    bin_locations = jnp.cumsum(widths, axis=-1)
    bin_locations = bin_locations.at[..., -1].set(1.0)
    bin_locations = binning.pad_zero_left(bin_locations)

    if inverse:
        onehot, _ = binning.bin_onehot(bin_left_cdf, inputs)
    else:
        onehot, _ = binning.bin_onehot(bin_locations, inputs)

    input_bin_locations = binning.select_bin(bin_locations[..., :-1], onehot)
    input_bin_widths = binning.select_bin(widths, onehot)
    input_left_cdf = binning.select_bin(bin_left_cdf[..., :-1], onehot)
    input_left_heights = binning.select_bin(heights[..., :-1], onehot)
    input_right_heights = binning.select_bin(heights[..., 1:], onehot)

    a = 0.5 * (input_right_heights - input_left_heights) * input_bin_widths
    b = input_left_heights * input_bin_widths
    c = input_left_cdf

    if inverse:
        c_ = c - inputs
        disc = jnp.maximum(b ** 2 - 4 * a * c_, 0.0)
        # Stable quadratic root: 2c' / (-b - sqrt(disc)) avoids cancellation
        # and stays finite as a -> 0 (equal heights), unlike (-b+sqrt)/(2a).
        alpha = (-2.0 * c_) / (b + jnp.sqrt(disc))
        outputs = alpha * input_bin_widths + input_bin_locations
        outputs = jnp.clip(outputs, 0.0, 1.0)
        logabsdet = -jnp.log(
            alpha * (input_right_heights - input_left_heights) + input_left_heights
        )
    else:
        alpha = (inputs - input_bin_locations) / input_bin_widths
        outputs = a * alpha ** 2 + b * alpha + c
        outputs = jnp.clip(outputs, 0.0, 1.0)
        logabsdet = jnp.log(
            alpha * (input_right_heights - input_left_heights) + input_left_heights
        )

    if inverse:
        outputs = outputs * (right - left) + left
    else:
        outputs = outputs * (top - bottom) + bottom
    return outputs, logabsdet


def unconstrained_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    tails: str = "linear",
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quadratic spline on [-B, B] with identity tails; heights must have
    K-1 entries so boundary pdf values normalize to 1 (reference
    quadratic.py:12-52)."""
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented.")
    num_bins = unnormalized_widths.shape[-1]
    assert unnormalized_heights.shape[-1] == num_bins - 1

    from nflows_tpu import config
    if config.use_pallas_splines():
        from nflows_tpu.ops.pallas.quadratic_spline import (
            quadratic_spline_pallas,
        )
        return quadratic_spline_pallas(
            inputs, unnormalized_widths, unnormalized_heights,
            inverse=inverse, tail_bound=tail_bound,
            min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        )

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    spline_out, spline_lad = quadratic_spline(
        inputs=jnp.clip(inputs, -tail_bound, tail_bound),
        unnormalized_widths=unnormalized_widths,
        unnormalized_heights=unnormalized_heights,
        inverse=inverse,
        left=-tail_bound, right=tail_bound,
        bottom=-tail_bound, top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_lad, jnp.zeros_like(spline_lad))
    return outputs, logabsdet
