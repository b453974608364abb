"""Pallas-fused linear-rational spline kernel (forward and inverse).

Same design as ops/pallas/rq_spline.py (that module's docstring covers the
layout rationale): the flattened element axis rides the TPU lanes, bin
parameters are laid out [K, N] so every K-loop is a short unrolled sequence
of [rows, 128] vector ops, and the whole chain — bin normalization, edges,
λ mapping, bin search, parameter select, two-piece Möbius evaluation /
analytic linear inverse, logabsdet, linear tails — is one VMEM pass.

Gradients: ``custom_vjp`` whose backward differentiates the pure-XLA
implementation (ops/splines/linear_rational.py), so training is exact while
forward/sampling runs fused. The LRS inverse being *linear* (no sqrt) makes
the fused inverse slightly cheaper than the RQ kernel's. Shared bin math /
scaffolding lives in ops/pallas/_spline_common.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from nflows_tpu.ops.pallas import _spline_common as sc
from nflows_tpu.ops.splines import linear_rational as lrs_ref

__all__ = ["lrs_spline_pallas"]


def _kernel(x_ref, w_ref, h_ref, d_ref, l_ref, out_ref, lad_ref, *,
            num_bins, inverse, tail_bound, min_bin_width, min_bin_height,
            min_derivative, min_lambda):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                      # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    widths = sc.softmax_bins([w_ref[k] for k in range(K)], min_bin_width)
    heights = sc.softmax_bins([h_ref[k] for k in range(K)], min_bin_height)
    edge_w = sc.edges_from_bins(widths, x, B)
    edge_h = sc.edges_from_bins(heights, x, B)
    bin_w = [edge_w[k + 1] - edge_w[k] for k in range(K)]
    bin_h = [edge_h[k + 1] - edge_h[k] for k in range(K)]

    derivs = [min_derivative + jnp.logaddexp(d_ref[k], 0.0)
              for k in range(K + 1)]
    lams = [
        min_lambda + (1.0 - 2.0 * min_lambda) / (1.0 + jnp.exp(-l_ref[k]))
        for k in range(K)
    ]

    idx = sc.bin_index_ge(x, edge_h if inverse else edge_w, K)
    (sel_w, sel_h, sel_x0, sel_y0, sel_d0, sel_d1,
     sel_lam) = sc.select_by_index(
        idx, K, bin_w, bin_h, edge_w[:K], edge_h[:K], derivs[:K], derivs[1:],
        lams)

    y1 = sel_y0 + sel_h
    wb = jnp.sqrt(sel_d0 / sel_d1)
    ym = ((1.0 - sel_lam) * sel_y0 + sel_lam * wb * y1) / (
        (1.0 - sel_lam) + sel_lam * wb)
    wm = sel_d0 * sel_lam * sel_w / (ym - sel_y0)

    if inverse:
        y = x
        use_a = y <= ym
        y_a = jnp.minimum(y, ym)
        y_b = jnp.maximum(y, ym)
        theta_a_inv = sel_lam * (y_a - sel_y0) / (
            wm * (ym - y_a) + (y_a - sel_y0))
        den_b_inv = wm * (ym - y_b) + wb * (y_b - y1)
        theta_b_inv = (wm * (ym - y_b) + wb * sel_lam * (y_b - y1)) / den_b_inv
        theta = jnp.where(use_a, theta_a_inv, theta_b_inv)
    else:
        theta = (x - sel_x0) / sel_w
        use_a = theta <= sel_lam

    theta_a = jnp.minimum(theta, sel_lam)
    theta_b = jnp.maximum(theta, sel_lam)
    den_a = (sel_lam - theta_a) + wm * theta_a
    den_b = wm * (1.0 - theta_b) + wb * (theta_b - sel_lam)

    if inverse:
        out = sel_x0 + theta * sel_w
    else:
        out_a = (sel_y0 * (sel_lam - theta_a) + wm * ym * theta_a) / den_a
        out_b = (wm * ym * (1.0 - theta_b)
                 + wb * y1 * (theta_b - sel_lam)) / den_b
        out = jnp.where(use_a, out_a, out_b)

    log_deriv_a = (jnp.log(wm) + jnp.log(sel_lam) + jnp.log(ym - sel_y0)
                   - 2.0 * jnp.log(den_a) - jnp.log(sel_w))
    log_deriv_b = (jnp.log(wm) + jnp.log(wb) + jnp.log1p(-sel_lam)
                   + jnp.log(y1 - ym) - 2.0 * jnp.log(den_b)
                   - jnp.log(sel_w))
    lad = jnp.where(use_a, log_deriv_a, log_deriv_b)
    if inverse:
        lad = -lad

    out_ref[...] = jnp.where(inside, out, x_orig)
    lad_ref[...] = jnp.where(inside, lad, jnp.zeros_like(lad))


def _run_pallas(inputs, params, statics, interpret):
    uw, uh, ud, ul = params
    (inverse, tail_bound, min_bin_width, min_bin_height, min_derivative,
     min_lambda) = statics
    K = uw.shape[-1]

    constant = float(np.log(np.exp(1 - min_derivative) - 1))
    pad = [(0, 0)] * (ud.ndim - 1) + [(1, 1)]
    ud_p = jnp.pad(ud, pad, constant_values=constant)

    x, stacks, N, shape = sc.flatten_pad_params(inputs, [uw, uh, ud_p, ul])
    kernel = functools.partial(
        _kernel, num_bins=K, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, min_lambda=min_lambda,
    )
    out, lad = sc.tiled_spline_call(kernel, x, stacks, interpret)
    return out[:N].reshape(shape), lad[:N].reshape(shape)


def _run_reference(inputs, params, statics):
    uw, uh, ud, ul = params
    (inverse, tail_bound, min_bin_width, min_bin_height, min_derivative,
     min_lambda) = statics
    return lrs_ref.unconstrained_linear_rational_spline(
        inputs, uw, uh, ud, ul, inverse=inverse, tails="linear",
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative,
        min_lambda=min_lambda,
    )


_core = sc.make_spline_core(_run_pallas, _run_reference)


def lrs_spline_pallas(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    unnormalized_lambdas: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = lrs_ref.DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = lrs_ref.DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = lrs_ref.DEFAULT_MIN_DERIVATIVE,
    min_lambda: float = lrs_ref.DEFAULT_MIN_LAMBDA,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused linear-tail LRS spline; same contract as
    ops.splines.unconstrained_linear_rational_spline with tails='linear'
    and K-1 derivative params."""
    return _core(
        inputs, (unnormalized_widths, unnormalized_heights,
                 unnormalized_derivatives, unnormalized_lambdas),
        (bool(inverse), float(tail_bound), float(min_bin_width),
         float(min_bin_height), float(min_derivative), float(min_lambda)),
        bool(interpret),
    )
