"""Pallas-fused piecewise-quadratic spline kernel (forward and inverse).

Same design as ops/pallas/rq_spline.py (see that docstring for the layout
rationale): element axis on lanes, bin parameters [K, N], the whole chain
— width softmax, boundary-height solve, trapezoid normalization, CDF
edges, bin search, select, quadratic evaluation / stable root inverse,
logabsdet, linear tails — in one VMEM pass. Implements the K-1-height
(normalized-boundary) variant used with linear tails, i.e. the coupling /
autoregressive configuration (reference
nflows/transforms/splines/quadratic.py:12-159).

Gradients: ``custom_vjp`` whose backward differentiates the pure-XLA
implementation (ops/splines/quadratic.py), so training stays exact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp

from nflows_tpu.ops.pallas import _spline_common as sc
from nflows_tpu.ops.splines import quadratic as q_ref

__all__ = ["quadratic_spline_pallas"]


def _kernel(x_ref, w_ref, h_ref, out_ref, lad_ref, *,
            num_bins, inverse, tail_bound, min_bin_width, min_bin_height):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                      # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)     # normalized [0, 1]

    # ---- width softmax (unrolled) ----
    widths = sc.softmax_bins([w_ref[k] for k in range(K)], min_bin_width)

    # ---- K-1 interior heights (softplus) + normalized boundary solve
    # (reference quadratic.py:88-104) ----
    he = [jnp.logaddexp(h_ref[k], 0.0) + 1e-3 for k in range(K - 1)]
    first_w = 0.5 * widths[0]
    last_w = 0.5 * widths[K - 1]
    numerator = 0.5 * first_w * he[0] + 0.5 * last_w * he[-1]
    for k in range(1, K - 1):
        numerator = numerator + 0.5 * (he[k - 1] + he[k]) * widths[k]
    constant = numerator / (1.0 - 0.5 * first_w - 0.5 * last_w)
    heights = [constant] + he + [constant]            # K+1 knot heights

    # trapezoid normalization + min-height floor
    area = jnp.zeros_like(x)
    for k in range(K):
        area = area + 0.5 * (heights[k] + heights[k + 1]) * widths[k]
    inv_area = 1.0 / area
    heights = [min_bin_height + (1.0 - min_bin_height) * h * inv_area
               for h in heights]

    # ---- CDF and location edges (last pinned exactly, zero left pad) ----
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    cdf = [zero]
    run = jnp.zeros_like(x)
    for k in range(K):
        run = run + 0.5 * (heights[k] + heights[k + 1]) * widths[k]
        cdf.append(run)
    cdf[-1] = one
    loc = [zero]
    run = jnp.zeros_like(x)
    for k in range(K):
        run = run + widths[k]
        loc.append(run)
    loc[-1] = one

    # ---- bin search + select ----
    idx = sc.bin_index_ge(x, cdf if inverse else loc, K)
    sel_loc, sel_w, sel_cdf, sel_h0, sel_h1 = sc.select_by_index(
        idx, K, loc[:K], widths, cdf[:K], heights[:K], heights[1:])

    a = 0.5 * (sel_h1 - sel_h0) * sel_w
    b = sel_h0 * sel_w
    c = sel_cdf

    if inverse:
        c_ = c - x
        disc = jnp.maximum(b * b - 4.0 * a * c_, 0.0)
        alpha = (-2.0 * c_) / (b + jnp.sqrt(disc))
        out01 = jnp.clip(alpha * sel_w + sel_loc, 0.0, 1.0)
        lad = -jnp.log(alpha * (sel_h1 - sel_h0) + sel_h0)
    else:
        alpha = (x - sel_loc) / sel_w
        out01 = jnp.clip(a * alpha * alpha + b * alpha + c, 0.0, 1.0)
        lad = jnp.log(alpha * (sel_h1 - sel_h0) + sel_h0)

    out = out01 * (2.0 * B) - B
    out_ref[...] = jnp.where(inside, out, x_orig)
    lad_ref[...] = jnp.where(inside, lad, jnp.zeros_like(lad))


def _run_pallas(inputs, params, statics, interpret):
    uw, uh = params
    inverse, tail_bound, min_bin_width, min_bin_height = statics
    K = uw.shape[-1]
    x, stacks, N, shape = sc.flatten_pad_params(inputs, [uw, uh])
    kernel = functools.partial(
        _kernel, num_bins=K, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
    )
    out, lad = sc.tiled_spline_call(kernel, x, stacks, interpret)
    return out[:N].reshape(shape), lad[:N].reshape(shape)


def _run_reference(inputs, params, statics):
    uw, uh = params
    inverse, tail_bound, min_bin_width, min_bin_height = statics
    return q_ref.unconstrained_quadratic_spline(
        inputs, uw, uh, inverse=inverse, tails="linear",
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
    )


_core = sc.make_spline_core(_run_pallas, _run_reference)


def quadratic_spline_pallas(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = q_ref.DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = q_ref.DEFAULT_MIN_BIN_HEIGHT,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused linear-tail quadratic spline. Same contract as
    ops.splines.unconstrained_quadratic_spline (K-1 heights)."""
    return _core(
        inputs, (unnormalized_widths, unnormalized_heights),
        (bool(inverse), float(tail_bound), float(min_bin_width),
         float(min_bin_height)), bool(interpret),
    )
