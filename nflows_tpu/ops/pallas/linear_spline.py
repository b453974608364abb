"""Pallas-fused piecewise-linear spline kernel (forward and inverse).

Same design as ops/pallas/rq_spline.py: element axis on lanes, pdf params
[K, N], the whole chain — softmax pdf, cumulative CDF, bin lookup
(equal-width forward / CDF search inverse), linear evaluation, logabsdet,
linear tails — in one VMEM pass. With the quadratic/RQ/LRS kernels this
completes the fused-kernel coverage of the spline families used with
linear tails (reference nflows/transforms/splines/linear.py:9-105).

Gradients: ``custom_vjp`` via the XLA implementation, training exact.
Shared bin math / scaffolding lives in ops/pallas/_spline_common.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from nflows_tpu.ops.pallas import _spline_common as sc
from nflows_tpu.ops.splines import linear as lin_ref

__all__ = ["linear_spline_pallas"]


def _kernel(x_ref, p_ref, out_ref, lad_ref, *, num_bins, inverse, tail_bound):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                      # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)      # normalized [0, 1]

    pdf = sc.softmax_bins([p_ref[k] for k in range(K)])
    cdf = sc.running_cdf(pdf, x)

    if inverse:
        idx = sc.bin_index_ge(x, cdf, K)
        slopes = [(cdf[k + 1] - cdf[k]) * K for k in range(K)]
        offs = [cdf[k + 1] - slopes[k] * ((k + 1.0) / K) for k in range(K)]
        sel_slope, sel_off = sc.select_by_index(idx, K, slopes, offs)
        out01 = jnp.clip((x - sel_off) / sel_slope, 0.0, 1.0)
        lad = -jnp.log(sel_slope)
    else:
        bin_pos = x * K
        fidx = jnp.floor(bin_pos)
        fidx = jnp.minimum(jnp.maximum(fidx, 0.0), float(K - 1))
        alpha = bin_pos - fidx
        idx = fidx.astype(jnp.int32)
        sel_pdf, sel_cdf = sc.select_by_index(idx, K, pdf, cdf)
        out01 = jnp.clip(sel_cdf + alpha * sel_pdf, 0.0, 1.0)
        lad = jnp.log(sel_pdf) - float(np.log(1.0 / K))

    out = out01 * (2.0 * B) - B
    out_ref[...] = jnp.where(inside, out, x_orig)
    lad_ref[...] = jnp.where(inside, lad, jnp.zeros_like(lad))


def _run_pallas(inputs, params, statics, interpret):
    (up,) = params
    inverse, tail_bound = statics
    K = up.shape[-1]
    x, stacks, N, shape = sc.flatten_pad_params(inputs, [up])
    kernel = functools.partial(
        _kernel, num_bins=K, inverse=inverse, tail_bound=tail_bound)
    out, lad = sc.tiled_spline_call(kernel, x, stacks, interpret)
    return out[:N].reshape(shape), lad[:N].reshape(shape)


def _run_reference(inputs, params, statics):
    (up,) = params
    inverse, tail_bound = statics
    return lin_ref.unconstrained_linear_spline(
        inputs, up, inverse=inverse, tails="linear", tail_bound=tail_bound)


_core = sc.make_spline_core(_run_pallas, _run_reference)


def linear_spline_pallas(
    inputs: jnp.ndarray,
    unnormalized_pdf: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused linear-tail piecewise-linear spline. Same contract as
    ops.splines.unconstrained_linear_spline."""
    return _core(inputs, (unnormalized_pdf,),
                 (bool(inverse), float(tail_bound)), bool(interpret))
