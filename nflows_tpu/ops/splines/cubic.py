"""Piecewise-cubic spline with Blinn's stable cubic root solve.

Behavioral parity with reference nflows/transforms/splines/cubic.py:63-267.
The reference scatters into three disjoint boolean-masked regions (one real
root / three real roots / near-quadratic); XLA forbids that, so all three
branches are computed full-width with operands sanitized per-branch
(the "double-where" trick) so no NaN leaks into the selected value *or its
gradient*, then combined with nested ``jnp.where``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from nflows_tpu.ops import binning

__all__ = [
    "cubic_spline",
    "unconstrained_cubic_spline",
    "DEFAULT_MIN_BIN_WIDTH",
    "DEFAULT_MIN_BIN_HEIGHT",
    "DEFAULT_EPS",
    "DEFAULT_QUADRATIC_THRESHOLD",
]

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_EPS = 1e-5
DEFAULT_QUADRATIC_THRESHOLD = 1e-3


def _cbrt(x):
    """Sign-preserving cube root, safe at 0."""
    return jnp.sign(x) * jnp.exp(jnp.log(jnp.maximum(jnp.abs(x), 1e-37)) / 3.0) * (
        jnp.abs(x) > 0
    )


def cubic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnorm_derivatives_left: jnp.ndarray,
    unnorm_derivatives_right: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    eps: float = DEFAULT_EPS,
    quadratic_threshold: float = DEFAULT_QUADRATIC_THRESHOLD,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monotone cubic (Steffen-style) spline CDF.

    inputs [...]; widths/heights [..., K]; boundary derivative params [..., 1].
    """
    num_bins = unnormalized_widths.shape[-1]
    if min_bin_width * num_bins > 1.0:
        raise ValueError("Minimal bin width too large for the number of bins")
    if min_bin_height * num_bins > 1.0:
        raise ValueError("Minimal bin height too large for the number of bins")

    if inverse:
        inputs = jnp.clip(inputs, bottom, top)
        inputs = (inputs - bottom) / (top - bottom)
    else:
        inputs = jnp.clip(inputs, left, right)
        inputs = (inputs - left) / (right - left)

    widths = binning.normalize_bins(unnormalized_widths, num_bins, min_bin_width)
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = cumwidths.at[..., -1].set(1.0)
    cumwidths = binning.pad_zero_left(cumwidths)

    heights = binning.normalize_bins(unnormalized_heights, num_bins, min_bin_height)
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = cumheights.at[..., -1].set(1.0)
    cumheights = binning.pad_zero_left(cumheights)

    # Monotone interior derivatives (Steffen 1990 / reference cubic.py:113-132)
    slopes = heights / widths
    min_something_1 = jnp.minimum(jnp.abs(slopes[..., :-1]), jnp.abs(slopes[..., 1:]))
    min_something_2 = (
        0.5
        * (widths[..., 1:] * slopes[..., :-1] + widths[..., :-1] * slopes[..., 1:])
        / (widths[..., :-1] + widths[..., 1:])
    )
    min_something = jnp.minimum(min_something_1, min_something_2)

    derivatives_left = (
        jax.nn.sigmoid(unnorm_derivatives_left) * 3 * slopes[..., 0][..., None]
    )
    derivatives_right = (
        jax.nn.sigmoid(unnorm_derivatives_right) * 3 * slopes[..., -1][..., None]
    )
    derivatives = min_something * (
        jnp.sign(slopes[..., :-1]) + jnp.sign(slopes[..., 1:])
    )
    derivatives = jnp.concatenate(
        [derivatives_left, derivatives, derivatives_right], axis=-1
    )

    # Per-bin cubic coefficients: y = a t^3 + b t^2 + c t + d, t = x - x_left
    a = (derivatives[..., :-1] + derivatives[..., 1:] - 2 * slopes) / widths ** 2
    b = (3 * slopes - 2 * derivatives[..., :-1] - derivatives[..., 1:]) / widths
    c = derivatives[..., :-1]
    d = cumheights[..., :-1]

    if inverse:
        onehot, _ = binning.bin_onehot(cumheights, inputs)
    else:
        onehot, _ = binning.bin_onehot(cumwidths, inputs)

    inputs_a = binning.select_bin(a, onehot)
    inputs_b = binning.select_bin(b, onehot)
    inputs_c = binning.select_bin(c, onehot)
    inputs_d = binning.select_bin(d, onehot)

    input_left_cumwidths = binning.select_bin(cumwidths[..., :-1], onehot)
    input_right_cumwidths = binning.select_bin(cumwidths[..., 1:], onehot)

    if inverse:
        quadratic_mask = jnp.abs(inputs_a) < quadratic_threshold
        cubic_mask = ~quadratic_mask

        # ---- cubic branches: sanitize a away from 0 where unused ----
        safe_a = jnp.where(cubic_mask, inputs_a, 1.0)
        b_ = (inputs_b / safe_a) / 3.0
        c_ = (inputs_c / safe_a) / 3.0
        d_ = (inputs_d - inputs) / safe_a

        delta_1 = -b_ ** 2 + c_
        delta_2 = -c_ * b_ + d_
        delta_3 = b_ * d_ - c_ ** 2
        discriminant = 4.0 * delta_1 * delta_3 - delta_2 ** 2

        depressed_1 = -2.0 * b_ * delta_1 + delta_2
        depressed_2 = delta_1

        three_roots_mask = discriminant >= 0

        # one real root (disc < 0): Cardano via cube roots
        sqrt_neg_disc = jnp.sqrt(jnp.maximum(-discriminant, 0.0))
        p = _cbrt((-depressed_1 + sqrt_neg_disc) / 2.0)
        q = _cbrt((-depressed_1 - sqrt_neg_disc) / 2.0)
        one_root_output = (p + q) - b_ + input_left_cumwidths

        # three real roots (disc >= 0): trigonometric method
        theta = jnp.arctan2(jnp.sqrt(jnp.maximum(discriminant, 0.0)), -depressed_1)
        theta = theta / 3.0
        cr1 = jnp.cos(theta)
        cr2 = jnp.sin(theta)
        root_1 = cr1
        root_2 = -0.5 * cr1 - 0.5 * math.sqrt(3) * cr2
        root_3 = -0.5 * cr1 + 0.5 * math.sqrt(3) * cr2
        root_scale = 2 * jnp.sqrt(jnp.maximum(-depressed_2, 0.0))
        root_shift = -b_ + input_left_cumwidths
        roots = jnp.stack([root_1, root_2, root_3], axis=-1)
        roots = roots * root_scale[..., None] + root_shift[..., None]
        in_bin = (
            (roots > (input_left_cumwidths - eps)[..., None])
            & (roots < (input_right_cumwidths + eps)[..., None])
        )
        # first in-bin root (argmax picks the first True)
        first = jnp.argmax(in_bin, axis=-1)
        sel = (first[..., None] == jnp.arange(3)).astype(roots.dtype)
        three_roots_output = jnp.sum(roots * sel, axis=-1)

        cubic_output = jnp.where(three_roots_mask, three_roots_output, one_root_output)

        # ---- near-quadratic branch: solve b t^2 + c t + (d - y) = 0 ----
        qa = jnp.where(quadratic_mask, inputs_b, 1.0)
        qb = inputs_c
        qc = inputs_d - inputs
        qdisc = jnp.maximum(qb ** 2 - 4 * qa * qc, 0.0)
        alpha = (-qb + jnp.sqrt(qdisc)) / (2 * qa)
        quadratic_output = alpha + input_left_cumwidths

        outputs = jnp.where(quadratic_mask, quadratic_output, cubic_output)

        shifted = outputs - input_left_cumwidths
        logabsdet = -jnp.log(
            3 * inputs_a * shifted ** 2 + 2 * inputs_b * shifted + inputs_c
        )
    else:
        shifted = inputs - input_left_cumwidths
        outputs = (
            inputs_a * shifted ** 3
            + inputs_b * shifted ** 2
            + inputs_c * shifted
            + inputs_d
        )
        logabsdet = jnp.log(
            3 * inputs_a * shifted ** 2 + 2 * inputs_b * shifted + inputs_c
        )

    if inverse:
        outputs = jnp.clip(outputs, 0.0, 1.0)
        outputs = outputs * (right - left) + left
    else:
        outputs = jnp.clip(outputs, 0.0, 1.0)
        outputs = outputs * (top - bottom) + bottom
    return outputs, logabsdet





def unconstrained_cubic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnorm_derivatives_left: jnp.ndarray,
    unnorm_derivatives_right: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    tails: str = "linear",
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    eps: float = DEFAULT_EPS,
    quadratic_threshold: float = DEFAULT_QUADRATIC_THRESHOLD,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cubic spline on [-B, B] with identity tails
    (reference cubic.py:15-60)."""
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented.")
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    spline_out, spline_lad = cubic_spline(
        inputs=jnp.clip(inputs, -tail_bound, tail_bound),
        unnormalized_widths=unnormalized_widths,
        unnormalized_heights=unnormalized_heights,
        unnorm_derivatives_left=unnorm_derivatives_left,
        unnorm_derivatives_right=unnorm_derivatives_right,
        inverse=inverse,
        left=-tail_bound, right=tail_bound,
        bottom=-tail_bound, top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        eps=eps,
        quadratic_threshold=quadratic_threshold,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_lad, jnp.zeros_like(spline_lad))
    return outputs, logabsdet
