"""Pallas-fused rational-quadratic spline kernel (forward and inverse).

The XLA implementation (ops/splines/rational_quadratic.py) materializes
several [N, K] intermediates (softmax, cumsum, one-hot selects) that XLA
fuses only partially. This kernel computes the whole chain — bin
normalization, cumulative edges, bin search, parameter select, rational-
quadratic evaluation / stable quadratic-root inverse, logabsdet, linear
tails — in one VMEM pass per tile.

Layout: the flattened element axis N rides the TPU lanes; bin parameters
are laid out [K, N] so every K-loop is a short unrolled sequence of
[rows, 128] vector ops at full lane utilization (K is 8–32; putting K on
lanes would waste 4–16x of the VPU). The producing GEMM's epilogue
transpose is fused by XLA.

Gradients: the kernel is wrapped in ``jax.custom_vjp`` whose backward pass
differentiates the pure-XLA reference implementation (rematerialized) — so
training gets exact grads while forward/sampling paths run the fused
kernel. Numerics match ops/splines/rational_quadratic.py to float32
round-off (see tests/ops/test_pallas_rq.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.splines import rational_quadratic as rq_ref

__all__ = ["rq_spline_pallas", "pallas_available"]

_LANES = 128
_ROWS = 64
_TILE = _LANES * _ROWS


def pallas_available() -> bool:
    """Pallas TPU path available on the default backend?"""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _kernel(x_ref, w_ref, h_ref, d_ref, out_ref, lad_ref, *,
            num_bins, inverse, tail_bound, min_bin_width, min_bin_height,
            min_derivative):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                      # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    # ---- bin normalization (softmax over K, unrolled) ----
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

    # ---- cumulative edges on [-B, B], endpoints pinned ----
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

    # ---- derivatives: min_d + softplus ----
    derivs = [min_derivative + jnp.logaddexp(d_ref[k], 0.0) for k in range(K + 1)]

    # ---- bin search on the relevant edge set ----
    search_edges = edge_h if inverse else edge_w
    idx = jnp.zeros_like(x, dtype=jnp.int32)
    for k in range(1, K):
        idx = idx + (x >= search_edges[k]).astype(jnp.int32)

    # ---- select per-element bin parameters ----
    sel_xw = bin_w[0]
    sel_xh = bin_h[0]
    sel_cw = edge_w[0]
    sel_ch = edge_h[0]
    sel_d0 = derivs[0]
    sel_d1 = derivs[1]
    for k in range(1, K):
        m = idx == k
        sel_xw = jnp.where(m, bin_w[k], sel_xw)
        sel_xh = jnp.where(m, bin_h[k], sel_xh)
        sel_cw = jnp.where(m, edge_w[k], sel_cw)
        sel_ch = jnp.where(m, edge_h[k], sel_ch)
        sel_d0 = jnp.where(m, derivs[k], sel_d0)
        sel_d1 = jnp.where(m, derivs[k + 1], sel_d1)

    delta = sel_xh / sel_xw
    d_sum = sel_d0 + sel_d1 - 2.0 * delta

    if inverse:
        y_rel = x - sel_ch
        a = y_rel * d_sum + sel_xh * (delta - sel_d0)
        b = sel_xh * sel_d0 - y_rel * d_sum
        c = -delta * y_rel
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        theta = (2.0 * c) / (-b - jnp.sqrt(disc))
        out = theta * sel_xw + sel_cw
    else:
        theta = (x - sel_cw) / sel_xw
        num = sel_xh * (delta * theta * theta + sel_d0 * theta * (1.0 - theta))
        den = delta + d_sum * theta * (1.0 - theta)
        out = sel_ch + num / den

    tomt = theta * (1.0 - theta)
    denominator = delta + d_sum * tomt
    deriv_num = delta * delta * (
        sel_d1 * theta * theta + 2.0 * delta * tomt
        + sel_d0 * (1.0 - theta) * (1.0 - theta)
    )
    lad = jnp.log(deriv_num) - 2.0 * jnp.log(denominator)
    if inverse:
        lad = -lad

    out_ref[...] = jnp.where(inside, out, x_orig)
    lad_ref[...] = jnp.where(inside, lad, jnp.zeros_like(lad))


def _pallas_impl(x_flat, w_t, h_t, d_t, *, num_bins, inverse, tail_bound,
                 min_bin_width, min_bin_height, min_derivative, interpret):
    """x_flat [N]; w_t/h_t [K, N]; d_t [K+1, N] (N multiple of TILE)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x_flat.shape[0]
    M = N // _LANES     # rows
    grid = (M // _ROWS,)

    x2 = x_flat.reshape(M, _LANES)
    w2 = w_t.reshape(num_bins, M, _LANES)
    h2 = h_t.reshape(num_bins, M, _LANES)
    d2 = d_t.reshape(num_bins + 1, M, _LANES)

    kernel = functools.partial(
        _kernel, num_bins=num_bins, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )

    out, lad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, _ROWS, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, _ROWS, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins + 1, _ROWS, _LANES), lambda i: (0, i, 0),
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
    )(x2, w2, h2, d2)
    return out.reshape(N), lad.reshape(N)


def _reference(inputs, uw, uh, ud, inverse, tail_bound, min_bin_width,
               min_bin_height, min_derivative):
    return rq_ref.unconstrained_rational_quadratic_spline(
        inputs, uw, uh, ud, inverse=inverse, tails="linear",
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _rq_pallas_core(inputs, uw, uh, ud, inverse, tail_bound, min_bin_width,
                    min_bin_height, min_derivative, interpret):
    """inputs [...]; uw/uh [..., K]; ud [..., K-1] (linear tails, unpadded)."""
    shape = inputs.shape
    K = uw.shape[-1]
    N = int(np.prod(shape))

    # pad derivative params with the boundary constant (tails="linear")
    constant = float(np.log(np.exp(1 - min_derivative) - 1))
    pad = [(0, 0)] * (ud.ndim - 1) + [(1, 1)]
    ud_p = jnp.pad(ud, pad, constant_values=constant)

    x = inputs.reshape(N)
    w_t = uw.reshape(N, K).T
    h_t = uh.reshape(N, K).T
    d_t = ud_p.reshape(N, K + 1).T

    pad_n = (-N) % _TILE
    if pad_n:
        x = jnp.pad(x, (0, pad_n))
        w_t = jnp.pad(w_t, ((0, 0), (0, pad_n)))
        h_t = jnp.pad(h_t, ((0, 0), (0, pad_n)))
        d_t = jnp.pad(d_t, ((0, 0), (0, pad_n)))

    out, lad = _pallas_impl(
        x, w_t, h_t, d_t, num_bins=K, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, interpret=interpret,
    )
    if pad_n:
        out = out[:N]
        lad = lad[:N]
    return out.reshape(shape), lad.reshape(shape)


def _rq_fwd(inputs, uw, uh, ud, inverse, tail_bound, min_bin_width,
            min_bin_height, min_derivative, interpret):
    outs = _rq_pallas_core(inputs, uw, uh, ud, inverse, tail_bound,
                           min_bin_width, min_bin_height, min_derivative,
                           interpret)
    return outs, (inputs, uw, uh, ud)


def _rq_bwd(inverse, tail_bound, min_bin_width, min_bin_height,
            min_derivative, interpret, residuals, cotangents):
    inputs, uw, uh, ud = residuals
    from nflows_tpu.config import _suspend_pallas_splines
    with _suspend_pallas_splines():
        _, vjp = jax.vjp(
            lambda i, w, h, d: _reference(i, w, h, d, inverse, tail_bound,
                                          min_bin_width, min_bin_height,
                                          min_derivative),
            inputs, uw, uh, ud,
        )
    return vjp(cotangents)


_rq_pallas_core.defvjp(_rq_fwd, _rq_bwd)


def rq_spline_pallas(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = rq_ref.DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = rq_ref.DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = rq_ref.DEFAULT_MIN_DERIVATIVE,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused linear-tail RQ spline. Same contract as
    ops.splines.unconstrained_rational_quadratic_spline with tails='linear'
    and K-1 derivative params."""
    return _rq_pallas_core(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, bool(inverse), float(tail_bound),
        float(min_bin_width), float(min_bin_height), float(min_derivative),
        bool(interpret),
    )
