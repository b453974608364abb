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
round-off (see tests/ops/test_pallas_rq.py). Shared bin math /
scaffolding lives in ops/pallas/_spline_common.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from nflows_tpu.ops.pallas import _spline_common as sc
from nflows_tpu.ops.pallas._spline_common import pallas_available  # noqa: F401 (re-export)
from nflows_tpu.ops.splines import rational_quadratic as rq_ref

__all__ = ["rq_spline_pallas", "pallas_available"]


def _kernel(x_ref, w_ref, h_ref, d_ref, out_ref, lad_ref, *,
            num_bins, inverse, tail_bound, min_bin_width, min_bin_height,
            min_derivative):
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

    idx = sc.bin_index_ge(x, edge_h if inverse else edge_w, K)
    sel_xw, sel_xh, sel_cw, sel_ch, sel_d0, sel_d1 = sc.select_by_index(
        idx, K, bin_w, bin_h, edge_w[:K], edge_h[:K], derivs[:K], derivs[1:])

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


def _run_pallas(inputs, params, statics, interpret):
    uw, uh, ud = params
    inverse, tail_bound, min_bin_width, min_bin_height, min_derivative = statics
    K = uw.shape[-1]

    # pad derivative params with the boundary constant (tails="linear")
    constant = float(np.log(np.exp(1 - min_derivative) - 1))
    pad = [(0, 0)] * (ud.ndim - 1) + [(1, 1)]
    ud_p = jnp.pad(ud, pad, constant_values=constant)

    x, stacks, N, shape = sc.flatten_pad_params(inputs, [uw, uh, ud_p])
    kernel = functools.partial(
        _kernel, num_bins=K, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    out, lad = sc.tiled_spline_call(kernel, x, stacks, interpret)
    return out[:N].reshape(shape), lad[:N].reshape(shape)


def _run_reference(inputs, params, statics):
    uw, uh, ud = params
    inverse, tail_bound, min_bin_width, min_bin_height, min_derivative = statics
    return rq_ref.unconstrained_rational_quadratic_spline(
        inputs, uw, uh, ud, inverse=inverse, tails="linear",
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative,
    )


_core = sc.make_spline_core(_run_pallas, _run_reference)


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
    return _core(
        inputs, (unnormalized_widths, unnormalized_heights,
                 unnormalized_derivatives),
        (bool(inverse), float(tail_bound), float(min_bin_width),
         float(min_bin_height), float(min_derivative)),
        bool(interpret),
    )
