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
the fused inverse slightly cheaper than the RQ kernel's.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.splines import linear_rational as lrs_ref

__all__ = ["lrs_spline_pallas"]

_LANES = 128
_ROWS = 64
_TILE = _LANES * _ROWS


def _kernel(x_ref, w_ref, h_ref, d_ref, l_ref, out_ref, lad_ref, *,
            num_bins, inverse, tail_bound, min_bin_width, min_bin_height,
            min_derivative, min_lambda):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                      # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    def normalize(ref, min_size):
        vals = [ref[k] for k in range(K)]
        vmax = vals[0]
        for v in vals[1:]:
            vmax = jnp.maximum(vmax, v)
        exps = [jnp.exp(v - vmax) for v in vals]
        total = exps[0]
        for e in exps[1:]:
            total = total + e
        inv_total = 1.0 / total
        return [min_size + (1.0 - min_size * K) * e * inv_total for e in exps]

    widths = normalize(w_ref, min_bin_width)
    heights = normalize(h_ref, min_bin_height)

    def edges_of(bins):
        edges = [jnp.full_like(x, -B)]
        run = jnp.zeros_like(x)
        for k in range(K):
            run = run + bins[k]
            edges.append(2.0 * B * run - B)
        edges[-1] = jnp.full_like(x, B)
        return edges

    edge_w = edges_of(widths)
    edge_h = edges_of(heights)
    bin_w = [edge_w[k + 1] - edge_w[k] for k in range(K)]
    bin_h = [edge_h[k + 1] - edge_h[k] for k in range(K)]

    derivs = [min_derivative + jnp.logaddexp(d_ref[k], 0.0) for k in range(K + 1)]
    lams = [
        min_lambda + (1.0 - 2.0 * min_lambda)
        / (1.0 + jnp.exp(-l_ref[k]))
        for k in range(K)
    ]

    search_edges = edge_h if inverse else edge_w
    idx = jnp.zeros_like(x, dtype=jnp.int32)
    for k in range(1, K):
        idx = idx + (x >= search_edges[k]).astype(jnp.int32)

    sel_w = bin_w[0]
    sel_h = bin_h[0]
    sel_x0 = edge_w[0]
    sel_y0 = edge_h[0]
    sel_d0 = derivs[0]
    sel_d1 = derivs[1]
    sel_lam = lams[0]
    for k in range(1, K):
        m = idx == k
        sel_w = jnp.where(m, bin_w[k], sel_w)
        sel_h = jnp.where(m, bin_h[k], sel_h)
        sel_x0 = jnp.where(m, edge_w[k], sel_x0)
        sel_y0 = jnp.where(m, edge_h[k], sel_y0)
        sel_d0 = jnp.where(m, derivs[k], sel_d0)
        sel_d1 = jnp.where(m, derivs[k + 1], sel_d1)
        sel_lam = jnp.where(m, lams[k], sel_lam)

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
        out_b = (wm * ym * (1.0 - theta_b) + wb * y1 * (theta_b - sel_lam)) / den_b
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


def _pallas_impl(x_flat, w_t, h_t, d_t, l_t, *, num_bins, inverse, tail_bound,
                 min_bin_width, min_bin_height, min_derivative, min_lambda,
                 interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x_flat.shape[0]
    M = N // _LANES
    grid = (M // _ROWS,)

    x2 = x_flat.reshape(M, _LANES)
    w2 = w_t.reshape(num_bins, M, _LANES)
    h2 = h_t.reshape(num_bins, M, _LANES)
    d2 = d_t.reshape(num_bins + 1, M, _LANES)
    l2 = l_t.reshape(num_bins, M, _LANES)

    kernel = functools.partial(
        _kernel, num_bins=num_bins, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, min_lambda=min_lambda,
    )

    def spec(k_dim):
        if k_dim is None:
            return pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((k_dim, _ROWS, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    out, lad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(None), spec(num_bins), spec(num_bins),
                  spec(num_bins + 1), spec(num_bins)],
        out_specs=[spec(None), spec(None)],
        out_shape=[
            jax.ShapeDtypeStruct((M, _LANES), x_flat.dtype),
            jax.ShapeDtypeStruct((M, _LANES), x_flat.dtype),
        ],
        interpret=interpret,
    )(x2, w2, h2, d2, l2)
    return out.reshape(N), lad.reshape(N)


def _reference(inputs, uw, uh, ud, ul, inverse, tail_bound, min_bin_width,
               min_bin_height, min_derivative, min_lambda):
    return lrs_ref.unconstrained_linear_rational_spline(
        inputs, uw, uh, ud, ul, inverse=inverse, tails="linear",
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative,
        min_lambda=min_lambda,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _lrs_pallas_core(inputs, uw, uh, ud, ul, inverse, tail_bound,
                     min_bin_width, min_bin_height, min_derivative,
                     min_lambda, interpret):
    """inputs [...]; uw/uh/ul [..., K]; ud [..., K-1] (linear tails)."""
    shape = inputs.shape
    K = uw.shape[-1]
    N = int(np.prod(shape))

    constant = float(np.log(np.exp(1 - min_derivative) - 1))
    pad = [(0, 0)] * (ud.ndim - 1) + [(1, 1)]
    ud_p = jnp.pad(ud, pad, constant_values=constant)

    x = inputs.reshape(N)
    w_t = uw.reshape(N, K).T
    h_t = uh.reshape(N, K).T
    d_t = ud_p.reshape(N, K + 1).T
    l_t = ul.reshape(N, K).T

    pad_n = (-N) % _TILE
    if pad_n:
        x = jnp.pad(x, (0, pad_n))
        w_t = jnp.pad(w_t, ((0, 0), (0, pad_n)))
        h_t = jnp.pad(h_t, ((0, 0), (0, pad_n)))
        d_t = jnp.pad(d_t, ((0, 0), (0, pad_n)))
        l_t = jnp.pad(l_t, ((0, 0), (0, pad_n)))

    out, lad = _pallas_impl(
        x, w_t, h_t, d_t, l_t, num_bins=K, inverse=inverse,
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative,
        min_lambda=min_lambda, interpret=interpret,
    )
    if pad_n:
        out = out[:N]
        lad = lad[:N]
    return out.reshape(shape), lad.reshape(shape)


def _lrs_fwd(inputs, uw, uh, ud, ul, inverse, tail_bound, min_bin_width,
             min_bin_height, min_derivative, min_lambda, interpret):
    outs = _lrs_pallas_core(inputs, uw, uh, ud, ul, inverse, tail_bound,
                            min_bin_width, min_bin_height, min_derivative,
                            min_lambda, interpret)
    return outs, (inputs, uw, uh, ud, ul)


def _lrs_bwd(inverse, tail_bound, min_bin_width, min_bin_height,
             min_derivative, min_lambda, interpret, residuals, cotangents):
    inputs, uw, uh, ud, ul = residuals
    from nflows_tpu.config import _suspend_pallas_splines
    with _suspend_pallas_splines():
        _, vjp = jax.vjp(
            lambda i, w, h, d, l: _reference(i, w, h, d, l, inverse, tail_bound,
                                             min_bin_width, min_bin_height,
                                             min_derivative, min_lambda),
            inputs, uw, uh, ud, ul,
        )
    return vjp(cotangents)


_lrs_pallas_core.defvjp(_lrs_fwd, _lrs_bwd)


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
    return _lrs_pallas_core(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, unnormalized_lambdas, bool(inverse),
        float(tail_bound), float(min_bin_width), float(min_bin_height),
        float(min_derivative), float(min_lambda), bool(interpret),
    )
