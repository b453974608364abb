"""Pallas-fused piecewise-linear spline kernel (forward and inverse).

Same design as ops/pallas/rq_spline.py: element axis on lanes, pdf params
[K, N], the whole chain — softmax pdf, cumulative CDF, bin lookup
(equal-width forward / CDF search inverse), linear evaluation, logabsdet,
linear tails — in one VMEM pass. With the quadratic/RQ/LRS kernels this
completes the fused-kernel coverage of the spline families used with
linear tails (reference nflows/transforms/splines/linear.py:9-105).

Gradients: ``custom_vjp`` via the XLA implementation, training exact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.splines import linear as lin_ref

__all__ = ["linear_spline_pallas"]

_LANES = 128
_ROWS = 64
_TILE = _LANES * _ROWS


def _kernel(x_ref, p_ref, out_ref, lad_ref, *, num_bins, inverse, tail_bound):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                      # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)      # normalized [0, 1]

    # softmax pdf (unrolled)
    vals = [p_ref[k] for k in range(K)]
    vmax = vals[0]
    for v in vals[1:]:
        vmax = jnp.maximum(vmax, v)
    exps = [jnp.exp(v - vmax) for v in vals]
    total = exps[0]
    for e in exps[1:]:
        total = total + e
    inv_total = 1.0 / total
    pdf = [e * inv_total for e in exps]

    # cdf edges, last pinned exactly
    one = jnp.ones_like(x)
    cdf = [jnp.zeros_like(x)]
    run = jnp.zeros_like(x)
    for k in range(K):
        run = run + pdf[k]
        cdf.append(run)
    cdf[-1] = one

    if inverse:
        # search on the cdf
        idx = jnp.zeros_like(x, dtype=jnp.int32)
        for k in range(1, K):
            idx = idx + (x >= cdf[k]).astype(jnp.int32)
        # slope_k = (cdf_{k+1}-cdf_k)*K; offset_k = cdf_{k+1}-slope_k*(k+1)/K
        sel_slope = (cdf[1] - cdf[0]) * K
        sel_off = cdf[1] - sel_slope * (1.0 / K)
        for k in range(1, K):
            m = idx == k
            slope_k = (cdf[k + 1] - cdf[k]) * K
            sel_slope = jnp.where(m, slope_k, sel_slope)
            sel_off = jnp.where(m, cdf[k + 1] - slope_k * ((k + 1.0) / K),
                                sel_off)
        out01 = jnp.clip((x - sel_off) / sel_slope, 0.0, 1.0)
        lad = -jnp.log(sel_slope)
    else:
        bin_pos = x * K
        fidx = jnp.floor(bin_pos)
        fidx = jnp.minimum(jnp.maximum(fidx, 0.0), float(K - 1))
        alpha = bin_pos - fidx
        idx = fidx.astype(jnp.int32)
        sel_pdf = pdf[0]
        sel_cdf = cdf[0]
        for k in range(1, K):
            m = idx == k
            sel_pdf = jnp.where(m, pdf[k], sel_pdf)
            sel_cdf = jnp.where(m, cdf[k], sel_cdf)
        out01 = jnp.clip(sel_cdf + alpha * sel_pdf, 0.0, 1.0)
        lad = jnp.log(sel_pdf) - float(np.log(1.0 / K))

    out = out01 * (2.0 * B) - B
    out_ref[...] = jnp.where(inside, out, x_orig)
    lad_ref[...] = jnp.where(inside, lad, jnp.zeros_like(lad))


def _pallas_impl(x_flat, p_t, *, num_bins, inverse, tail_bound, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x_flat.shape[0]
    M = N // _LANES
    grid = (M // _ROWS,)

    x2 = x_flat.reshape(M, _LANES)
    p2 = p_t.reshape(num_bins, M, _LANES)

    kernel = functools.partial(
        _kernel, num_bins=num_bins, inverse=inverse, tail_bound=tail_bound,
    )
    out, lad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, _ROWS, _LANES), lambda i: (0, i, 0),
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
    )(x2, p2)
    return out.reshape(N), lad.reshape(N)


def _reference(inputs, up, inverse, tail_bound):
    return lin_ref.unconstrained_linear_spline(
        inputs, up, inverse=inverse, tails="linear", tail_bound=tail_bound)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _lin_pallas_core(inputs, up, inverse, tail_bound, interpret):
    shape = inputs.shape
    K = up.shape[-1]
    N = int(np.prod(shape))

    x = inputs.reshape(N)
    p_t = up.reshape(N, K).T

    pad_n = (-N) % _TILE
    if pad_n:
        x = jnp.pad(x, (0, pad_n))
        p_t = jnp.pad(p_t, ((0, 0), (0, pad_n)))

    out, lad = _pallas_impl(x, p_t, num_bins=K, inverse=inverse,
                            tail_bound=tail_bound, interpret=interpret)
    if pad_n:
        out = out[:N]
        lad = lad[:N]
    return out.reshape(shape), lad.reshape(shape)


def _lin_fwd(inputs, up, inverse, tail_bound, interpret):
    outs = _lin_pallas_core(inputs, up, inverse, tail_bound, interpret)
    return outs, (inputs, up)


def _lin_bwd(inverse, tail_bound, interpret, residuals, cotangents):
    inputs, up = residuals
    from nflows_tpu.config import _suspend_pallas_splines
    with _suspend_pallas_splines():
        _, vjp = jax.vjp(
            lambda i, p: _reference(i, p, inverse, tail_bound),
            inputs, up,
        )
    return vjp(cotangents)


_lin_pallas_core.defvjp(_lin_fwd, _lin_bwd)


def linear_spline_pallas(
    inputs: jnp.ndarray,
    unnormalized_pdf: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused linear-tail piecewise-linear spline. Same contract as
    ops.splines.unconstrained_linear_spline."""
    return _lin_pallas_core(inputs, unnormalized_pdf, bool(inverse),
                            float(tail_bound), bool(interpret))
