"""Monotonic linear-rational spline (Dolatabadi et al. 2020, arXiv:2001.05168).

A capability BEYOND the reference library (bayesiains/nflows has no LRS):
each bin maps through two monotone Möbius (linear-rational) segments joined
C¹-continuously at a learnable split point λ ∈ (0, 1). Compared to the
rational-quadratic spline, the inverse is a *linear* solve (no quadratic
root), so forward and inverse cost the same and are exactly consistent.

Derivation (self-contained; weights fixed by the bin constraints):
within a bin [x0, x0+w] -> [y0, y0+h] with endpoint derivatives d0, d1 and
normalized position θ = (x - x0)/w, a Möbius segment from (va, wa) to
(vb, wb) is y(φ) = (wa·va·(1-φ) + wb·vb·φ) / (wa·(1-φ) + wb·φ). Splitting
at θ = λ with an intermediate point (ym, wm) and requiring y'(x0) = d0,
y'(x1) = d1 and derivative continuity at λ gives (taking wa = 1):

    wb = sqrt(d0 / d1)
    ym = ((1-λ)·y0 + λ·wb·y1) / ((1-λ) + λ·wb)
    wm = d0·λ·w / (ym - y0)

Piece A (θ ≤ λ):  y = (y0·(λ-θ) + wm·ym·θ) / ((λ-θ) + wm·θ),
                  dy/dx = wm·λ·(ym-y0) / (den²·w)
Piece B (θ > λ):  y = (wm·ym·(1-θ) + wb·y1·(θ-λ)) / (wm·(1-θ) + wb·(θ-λ)),
                  dy/dx = wm·wb·(1-λ)·(y1-ym) / (den²·w)

Inverse: each piece is Möbius, hence linear in θ:
    A: θ = λ·(y-y0) / (wm·(ym-y) + (y-y0))
    B: θ = (wm·(ym-y) + wb·λ·(y-y1)) / (wm·(ym-y) + wb·(y-y1))

XLA style matches ops/splines/rational_quadratic.py: full-width evaluation
of both pieces with operand sanitization (inputs clamped into each piece's
valid range before its formula — the "double-where" pattern, DESIGN.md §2),
one-hot bin select, static shapes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops import binning

__all__ = [
    "linear_rational_spline",
    "unconstrained_linear_rational_spline",
    "DEFAULT_MIN_BIN_WIDTH",
    "DEFAULT_MIN_BIN_HEIGHT",
    "DEFAULT_MIN_DERIVATIVE",
    "DEFAULT_MIN_LAMBDA",
]

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3
DEFAULT_MIN_LAMBDA = 0.025


def linear_rational_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    unnormalized_lambdas: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    min_lambda: float = DEFAULT_MIN_LAMBDA,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LRS on [left,right] -> [bottom,top].

    inputs [...]; widths/heights/lambdas [..., K]; derivatives [..., K+1].
    Returns (outputs [...], logabsdet [...]) — per-element logabsdet.
    """
    num_bins = unnormalized_widths.shape[-1]
    if min_bin_width * num_bins > 1.0:
        raise ValueError("Minimal bin width too large for the number of bins")
    if min_bin_height * num_bins > 1.0:
        raise ValueError("Minimal bin height too large for the number of bins")

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

    derivatives = min_derivative + jnp.logaddexp(unnormalized_derivatives, 0.0)

    heights = binning.normalize_bins(unnormalized_heights, num_bins, min_bin_height)
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = binning.pad_zero_left(cumheights)
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    lambdas = min_lambda + (1.0 - 2.0 * min_lambda) * jax.nn.sigmoid(
        unnormalized_lambdas
    )

    if inverse:
        onehot, _ = binning.bin_onehot(cumheights, inputs)
    else:
        onehot, _ = binning.bin_onehot(cumwidths, inputs)

    x0 = binning.select_bin(cumwidths[..., :-1], onehot)
    w = binning.select_bin(widths, onehot)
    y0 = binning.select_bin(cumheights[..., :-1], onehot)
    h = binning.select_bin(heights, onehot)
    d0 = binning.select_bin(derivatives[..., :num_bins], onehot)
    d1 = binning.select_bin(derivatives[..., 1:num_bins + 1], onehot)
    lam = binning.select_bin(lambdas, onehot)
    y1 = y0 + h

    # weights of the two Möbius pieces (wa = 1)
    wb = jnp.sqrt(d0 / d1)
    ym = ((1.0 - lam) * y0 + lam * wb * y1) / ((1.0 - lam) + lam * wb)
    wm = d0 * lam * w / (ym - y0)

    if inverse:
        y = inputs
        use_a = y <= ym
        # sanitize each piece's input into its own range (double-where)
        y_a = jnp.minimum(y, ym)
        y_b = jnp.maximum(y, ym)
        theta_a_inv = lam * (y_a - y0) / (wm * (ym - y_a) + (y_a - y0))
        den_b_inv = wm * (ym - y_b) + wb * (y_b - y1)
        theta_b_inv = (wm * (ym - y_b) + wb * lam * (y_b - y1)) / den_b_inv
        theta = jnp.where(use_a, theta_a_inv, theta_b_inv)
    else:
        theta = (inputs - x0) / w
        use_a = theta <= lam

    # single piece-sanitized evaluation serves output AND logabsdet
    theta_a = jnp.minimum(theta, lam)
    theta_b = jnp.maximum(theta, lam)
    den_a = (lam - theta_a) + wm * theta_a
    den_b = wm * (1.0 - theta_b) + wb * (theta_b - lam)

    if inverse:
        outputs = x0 + theta * w
    else:
        out_a = (y0 * (lam - theta_a) + wm * ym * theta_a) / den_a
        out_b = (wm * ym * (1.0 - theta_b) + wb * y1 * (theta_b - lam)) / den_b
        outputs = jnp.where(use_a, out_a, out_b)

    log_deriv_a = (
        jnp.log(wm) + jnp.log(lam) + jnp.log(ym - y0)
        - 2.0 * jnp.log(den_a) - jnp.log(w)
    )
    log_deriv_b = (
        jnp.log(wm) + jnp.log(wb) + jnp.log1p(-lam) + jnp.log(y1 - ym)
        - 2.0 * jnp.log(den_b) - jnp.log(w)
    )
    logabsdet = jnp.where(use_a, log_deriv_a, log_deriv_b)
    return outputs, (-logabsdet if inverse else logabsdet)


def unconstrained_linear_rational_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    unnormalized_lambdas: jnp.ndarray,
    inverse: bool = False,
    tails: str = "linear",
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    min_lambda: float = DEFAULT_MIN_LAMBDA,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LRS on [-B, B] with identity tails; derivative params [..., K-1] are
    padded so the boundary derivatives are exactly 1 (same convention as the
    RQ spline's linear-tail variant)."""
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented.")

    if unnormalized_derivatives.shape[-1] == unnormalized_widths.shape[-1] - 1:
        from nflows_tpu import config
        if config.use_pallas_splines():
            from nflows_tpu.ops.pallas.lrs_spline import lrs_spline_pallas
            return lrs_spline_pallas(
                inputs, unnormalized_widths, unnormalized_heights,
                unnormalized_derivatives, unnormalized_lambdas,
                inverse=inverse, tail_bound=tail_bound,
                min_bin_width=min_bin_width, min_bin_height=min_bin_height,
                min_derivative=min_derivative, min_lambda=min_lambda,
            )

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    pad = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(unnormalized_derivatives, pad)
    constant = float(np.log(np.exp(1 - min_derivative) - 1))
    unnormalized_derivatives = unnormalized_derivatives.at[..., 0].set(constant)
    unnormalized_derivatives = unnormalized_derivatives.at[..., -1].set(constant)

    spline_out, spline_lad = linear_rational_spline(
        inputs=jnp.clip(inputs, -tail_bound, tail_bound),
        unnormalized_widths=unnormalized_widths,
        unnormalized_heights=unnormalized_heights,
        unnormalized_derivatives=unnormalized_derivatives,
        unnormalized_lambdas=unnormalized_lambdas,
        inverse=inverse,
        left=-tail_bound, right=tail_bound,
        bottom=-tail_bound, top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
        min_lambda=min_lambda,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_lad, jnp.zeros_like(spline_lad))
    return outputs, logabsdet
