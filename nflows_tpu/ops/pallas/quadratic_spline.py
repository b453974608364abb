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

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.splines import quadratic as q_ref

__all__ = ["quadratic_spline_pallas"]

_LANES = 128
_ROWS = 64
_TILE = _LANES * _ROWS


def _kernel(x_ref, w_ref, h_ref, out_ref, lad_ref, *,
            num_bins, inverse, tail_bound, min_bin_width, min_bin_height):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                      # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)     # normalized [0, 1]

    # ---- width softmax (unrolled) ----
    wvals = [w_ref[k] for k in range(K)]
    vmax = wvals[0]
    for v in wvals[1:]:
        vmax = jnp.maximum(vmax, v)
    exps = [jnp.exp(v - vmax) for v in wvals]
    total = exps[0]
    for e in exps[1:]:
        total = total + e
    inv_total = 1.0 / total
    widths = [min_bin_width + (1.0 - min_bin_width * K) * e * inv_total
              for e in exps]

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

    # ---- bin search ----
    search = cdf if inverse else loc
    idx = jnp.zeros_like(x, dtype=jnp.int32)
    for k in range(1, K):
        idx = idx + (x >= search[k]).astype(jnp.int32)

    sel_loc, sel_w = loc[0], widths[0]
    sel_cdf = cdf[0]
    sel_h0, sel_h1 = heights[0], heights[1]
    for k in range(1, K):
        m = idx == k
        sel_loc = jnp.where(m, loc[k], sel_loc)
        sel_w = jnp.where(m, widths[k], sel_w)
        sel_cdf = jnp.where(m, cdf[k], sel_cdf)
        sel_h0 = jnp.where(m, heights[k], sel_h0)
        sel_h1 = jnp.where(m, heights[k + 1], sel_h1)

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


def _pallas_impl(x_flat, w_t, h_t, *, num_bins, inverse, tail_bound,
                 min_bin_width, min_bin_height, interpret):
    """x_flat [N]; w_t [K, N]; h_t [K-1, N] (N multiple of TILE)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x_flat.shape[0]
    M = N // _LANES
    grid = (M // _ROWS,)

    x2 = x_flat.reshape(M, _LANES)
    w2 = w_t.reshape(num_bins, M, _LANES)
    h2 = h_t.reshape(num_bins - 1, M, _LANES)

    kernel = functools.partial(
        _kernel, num_bins=num_bins, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
    )

    out, lad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, _ROWS, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins - 1, _ROWS, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, _LANES), x_flat.dtype),
            jax.ShapeDtypeStruct((M, _LANES), x_flat.dtype),
        ],
        interpret=interpret,
    )(x2, w2, h2)
    return out.reshape(N), lad.reshape(N)


def _reference(inputs, uw, uh, inverse, tail_bound, min_bin_width,
               min_bin_height):
    return q_ref.unconstrained_quadratic_spline(
        inputs, uw, uh, inverse=inverse, tails="linear",
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _q_pallas_core(inputs, uw, uh, inverse, tail_bound, min_bin_width,
                   min_bin_height, interpret):
    """inputs [...]; uw [..., K]; uh [..., K-1] (linear tails)."""
    shape = inputs.shape
    K = uw.shape[-1]
    N = int(np.prod(shape))

    x = inputs.reshape(N)
    w_t = uw.reshape(N, K).T
    h_t = uh.reshape(N, K - 1).T

    pad_n = (-N) % _TILE
    if pad_n:
        x = jnp.pad(x, (0, pad_n))
        w_t = jnp.pad(w_t, ((0, 0), (0, pad_n)))
        h_t = jnp.pad(h_t, ((0, 0), (0, pad_n)))

    out, lad = _pallas_impl(
        x, w_t, h_t, num_bins=K, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        interpret=interpret,
    )
    if pad_n:
        out = out[:N]
        lad = lad[:N]
    return out.reshape(shape), lad.reshape(shape)


def _q_fwd(inputs, uw, uh, inverse, tail_bound, min_bin_width,
           min_bin_height, interpret):
    outs = _q_pallas_core(inputs, uw, uh, inverse, tail_bound,
                          min_bin_width, min_bin_height, interpret)
    return outs, (inputs, uw, uh)


def _q_bwd(inverse, tail_bound, min_bin_width, min_bin_height, interpret,
           residuals, cotangents):
    inputs, uw, uh = residuals
    from nflows_tpu.config import _suspend_pallas_splines
    with _suspend_pallas_splines():
        _, vjp = jax.vjp(
            lambda i, w, h: _reference(i, w, h, inverse, tail_bound,
                                       min_bin_width, min_bin_height),
            inputs, uw, uh,
        )
    return vjp(cotangents)


_q_pallas_core.defvjp(_q_fwd, _q_bwd)


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
    return _q_pallas_core(
        inputs, unnormalized_widths, unnormalized_heights, bool(inverse),
        float(tail_bound), float(min_bin_width), float(min_bin_height),
        bool(interpret),
    )
