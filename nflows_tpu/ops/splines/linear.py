"""Piecewise-linear spline (Neural Importance Sampling, Müller et al. 2018).

Behavioral parity with reference nflows/transforms/splines/linear.py:38-105,
restructured full-width for XLA (where-select tails, one-hot bin lookup —
see ops/splines/rational_quadratic.py for the design rationale).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops import binning

__all__ = ["linear_spline", "unconstrained_linear_spline"]


def linear_spline(
    inputs: jnp.ndarray,
    unnormalized_pdf: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear spline with K equal-width bins and softmax-normalized pdf.

    inputs [...]; unnormalized_pdf [..., K].
    """
    # Clamp into the closed domain (reference raises InputOutsideDomain).
    if inverse:
        inputs = jnp.clip(inputs, bottom, top)
        inputs = (inputs - bottom) / (top - bottom)
    else:
        inputs = jnp.clip(inputs, left, right)
        inputs = (inputs - left) / (right - left)

    num_bins = unnormalized_pdf.shape[-1]
    pdf = jax.nn.softmax(unnormalized_pdf, axis=-1)

    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = cdf.at[..., -1].set(1.0)
    cdf = binning.pad_zero_left(cdf)

    if inverse:
        onehot, _ = binning.bin_onehot(cdf, inputs)
        # Equal-width bins: boundaries at k/K. slope_k = pdf_k * K;
        # offset_k = cdf_{k+1} - slope_k * (k+1)/K.
        boundaries = jnp.arange(1, num_bins + 1, dtype=inputs.dtype) / num_bins
        slopes = (cdf[..., 1:] - cdf[..., :-1]) * num_bins
        offsets = cdf[..., 1:] - slopes * boundaries

        input_slopes = binning.select_bin(slopes, onehot)
        input_offsets = binning.select_bin(offsets, onehot)

        outputs = (inputs - input_offsets) / input_slopes
        outputs = jnp.clip(outputs, 0.0, 1.0)
        logabsdet = -jnp.log(input_slopes)
    else:
        bin_pos = inputs * num_bins
        bin_idx = jnp.clip(jnp.floor(bin_pos).astype(jnp.int32), 0, num_bins - 1)
        alpha = bin_pos - bin_idx.astype(inputs.dtype)
        onehot = (bin_idx[..., None] == jnp.arange(num_bins)).astype(inputs.dtype)

        input_pdfs = binning.select_bin(pdf, onehot)
        outputs = binning.select_bin(cdf[..., :-1], onehot) + alpha * input_pdfs
        outputs = jnp.clip(outputs, 0.0, 1.0)
        logabsdet = jnp.log(input_pdfs) - float(np.log(1.0 / num_bins))

    if inverse:
        outputs = outputs * (right - left) + left
    else:
        outputs = outputs * (top - bottom) + bottom
    return outputs, logabsdet


def unconstrained_linear_spline(
    inputs: jnp.ndarray,
    unnormalized_pdf: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    tails: str = "linear",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear spline on [-B, B], identity outside
    (reference linear.py:9-36)."""
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented.")

    from nflows_tpu import config
    if config.use_pallas_splines():
        from nflows_tpu.ops.pallas.linear_spline import linear_spline_pallas
        return linear_spline_pallas(
            inputs, unnormalized_pdf, inverse=inverse,
            tail_bound=tail_bound,
        )

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    spline_out, spline_lad = linear_spline(
        inputs=jnp.clip(inputs, -tail_bound, tail_bound),
        unnormalized_pdf=unnormalized_pdf,
        inverse=inverse,
        left=-tail_bound, right=tail_bound,
        bottom=-tail_bound, top=tail_bound,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_lad, jnp.zeros_like(spline_lad))
    return outputs, logabsdet
