"""Whole-flow fused Pallas kernel for tabular NSF coupling flows.

The XLA sampling/log_prob path for an L-layer RQ-NSF flow streams every
intermediate activation ([N, hidden] per conditioner GEMM) through HBM —
at large N the chain is HBM-bandwidth-bound (measured ~18 TFLOPS effective
on the 10x256 flagship, BASELINE.md). This kernel runs the ENTIRE
transform chain — all L x [permutation, RQ coupling(ResidualNet
conditioner)] layers — in one ``pallas_call``:

- **Layout**: samples ride the TPU *lanes*; the kernel state is x^T
  [D, R] per grid tile (R samples). All conditioner GEMMs become
  W^T @ h ([H, H] x [H, R]) with stationary weights; the elementwise
  spline operates on [T, R] slices (T = transformed features/layer) at
  full lane utilization.
- **Weights resident in VMEM, loaded once**: the stacked per-layer
  weights (~0.56 MB per 256-wide layer in bf16) are kernel inputs pinned
  to HBM and DMA'd into persistent VMEM *scratch* on the first grid step —
  single-buffered (BlockSpec'd inputs would be double-buffered and blow
  the 16 MB VMEM). HBM traffic per pass is ~(x in + x out + weights once)
  instead of ~6 activations x L.
- **Unrolled layers, sliced weight refs**: the L layers unroll at trace
  time with static per-layer row indices; every GEMM slices exactly its
  weight matrix out of the scratch ref (``wb_v[l, j]``). Loading a whole
  stacked array (``wb_v[...]``) as one value would pin megabytes live on
  the Mosaic stack for the entire kernel — the failure mode that
  originally blew the 16 MB VMEM budget (measured 19.25 MB scoped).
- **Static gathers**: permutations, coupling splits and merges are
  composed host-side into per-layer static row lists; in-kernel they are
  unrolled 1-row slices + concat (D is small), which Mosaic lowers to
  sublane shuffles — no dynamic gather anywhere.
- **Precision**: GEMMs run in the dtype the weights were extracted in
  (bf16 by default, matching the bf16-MXU training configuration) with
  fp32 accumulation; spline math and the logabsdet are fp32.

The spline math mirrors ops/pallas/rq_spline.py (full-width where,
unrolled K); reference semantics: nflows/transforms/coupling.py:502-582 +
nflows/transforms/splines/rational_quadratic.py:66-181.

Extraction from a model (weight re-layout, softmax 1/sqrt(H) folding,
K-major param reordering, selection-matrix construction) lives in
``nsf_fused.py``; this module is the raw kernel.

Gradients: inference-only — training uses the autodiff'd XLA chain; this
kernel exists to win sampling/evaluation throughput.
"""

from __future__ import annotations

import contextlib
import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from nflows_tpu.ops.pallas._kernel_common import (
    start_weight_dmas,
    wait_dmas,
)

__all__ = ["nsf_flow_kernel_call", "LANES_DEFAULT"]

LANES_DEFAULT = 1024  # samples per grid tile


def _dot(w, h, out_dtype=jnp.float32):
    """MXU GEMM with fp32 accumulation; w sets the compute dtype."""
    return jax.lax.dot_general(
        w, h.astype(w.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
    )


def _conditioner(identity, l, w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
                 num_blocks, H, TM, ctx=None, wc0_v=None, wcb_v=None,
                 bcb_v=None):
    """ResidualNet forward in transposed layout: [Tid, R] -> [TM, R].

    Matches nn/nets/resnet.py:ResidualNet with relu activation, no
    batch-norm/dropout (reference nn/nets/resnet.py:55-100). With a
    per-sample context ``ctx`` [C, R] (resident in VMEM alongside the
    state): the initial layer adds the context columns of the concat
    weight (reference resnet.py:81: net runs on [inputs ‖ context]) and
    each block gates its residual with a context GLU
    (reference resnet.py:51: ``glu([temps, ctx_proj])`` = temps *
    sigmoid(ctx_proj)) — one extra stationary GEMM per block.

    All weight stacks are FLATTENED 2-D refs ([L*H, in] etc.) addressed
    with static row-range slices, for two reasons: (1) loading a whole
    stacked array (``wb_v[...]``) as one value pins megabytes live on the
    Mosaic stack for the entire kernel (measured 19.25 MB scoped VMEM);
    (2) per-layer slicing of >2-D refs hung the Mosaic compiler on this
    toolchain — static dim-0 range slices of 2-D refs lower robustly.
    """
    def w(ref, i, rows):
        return ref[i * rows:(i + 1) * rows, :]

    nb = 2 * num_blocks
    h = _dot(w(w0_v, l, H), identity) + w(b0_v, l, H)
    if ctx is not None:
        h = h + _dot(w(wc0_v, l, H), ctx)
    for j in range(num_blocks):
        t = jnp.maximum(h, 0.0)
        t = _dot(w(wb_v, l * nb + 2 * j, H), t) + w(bb_v, l * nb + 2 * j, H)
        t = jnp.maximum(t, 0.0)
        t = _dot(w(wb_v, l * nb + 2 * j + 1, H), t) + w(bb_v, l * nb + 2 * j + 1, H)
        if ctx is not None:
            gate = (_dot(w(wcb_v, l * num_blocks + j, H), ctx)
                    + w(bcb_v, l * num_blocks + j, H))
            t = t * (1.0 / (1.0 + jnp.exp(-gate)))
        h = h + t
    return _dot(w(wf_v, l, TM), h) + w(bf_v, l, TM)


def _rq_eval_selected(x, sel_xw, sel_xh, sel_cw, sel_ch, sel_d0, sel_d1,
                      inverse):
    """RQ-spline evaluation from per-element SELECTED bin parameters —
    the math shared verbatim by the unpacked and both packed front
    halves (reference rational_quadratic.py:132-181). Returns
    (out, logabsdet), both the shape of ``x``."""
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
    return out, lad


def _rq_spline_TR(x_in, P, *, num_bins, T, inverse, tail_bound,
                  min_bin_width, min_bin_height, min_derivative):
    """Unconstrained (linear-tail) RQ spline on [T, R] tensors.

    ``P`` is [TM, R], K-major: rows [j*T:(j+1)*T] hold param j for all T
    features — widths j<K, heights K<=j<2K, interior derivatives
    2K<=j<3K-1. Boundary derivatives are exactly 1 (min_derivative +
    softplus(boundary constant), reference rational_quadratic.py:37-42).
    Returns (out [T, R], logabsdet [T, R]).
    """
    from nflows_tpu.ops.pallas import _spline_common as sc

    K = num_bins
    B = tail_bound
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    def slice_j(j):
        return P[j * T:(j + 1) * T]

    widths = sc.softmax_bins([slice_j(j) for j in range(K)], min_bin_width)
    heights = sc.softmax_bins([slice_j(K + j) for j in range(K)],
                              min_bin_height)

    edge_w = sc.edges_from_bins(widths, x, B)
    edge_h = sc.edges_from_bins(heights, x, B)
    bin_w = [edge_w[k + 1] - edge_w[k] for k in range(K)]
    bin_h = [edge_h[k + 1] - edge_h[k] for k in range(K)]

    one = jnp.ones_like(x)
    derivs = [one] + [
        min_derivative + jnp.logaddexp(slice_j(2 * K + j), 0.0)
        for j in range(K - 1)
    ] + [one]

    idx = sc.bin_index_ge(x, edge_h if inverse else edge_w, K)
    sel_xw, sel_xh, sel_cw, sel_ch, sel_d0, sel_d1 = sc.select_by_index(
        idx, K, bin_w, bin_h, edge_w[:K], edge_h[:K],
        derivs[:K], derivs[1:])

    out, lad = _rq_eval_selected(x, sel_xw, sel_xh, sel_cw, sel_ch,
                                 sel_d0, sel_d1, inverse)

    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _take_rows(x, rows):
    """Static sublane gather: x[list_of_rows, :] via 1-row slices+concat."""
    return jnp.concatenate([x[r:r + 1] for r in rows], axis=0)


def _lrs_spline_TR(x_in, P, *, num_bins, T, inverse, tail_bound,
                   min_bin_width, min_bin_height, min_derivative,
                   min_lambda):
    """Unconstrained (linear-tail) linear-rational spline on [T, R]
    tensors — the beyond-reference family (Dolatabadi et al. 2020).

    ``P`` is [TM, R], K-major: widths j<K, heights K<=j<2K, lambdas
    2K<=j<3K, interior derivatives 3K<=j<4K-1 (boundary derivs are exactly
    1, as in the RQ case). Math mirrors ops/pallas/lrs_spline.py.
    Returns (out [T, R], logabsdet [T, R]).
    """
    K = num_bins
    B = tail_bound
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    from nflows_tpu.ops.pallas import _spline_common as sc

    def slice_j(j):
        return P[j * T:(j + 1) * T]

    widths = sc.softmax_bins([slice_j(j) for j in range(K)], min_bin_width)
    heights = sc.softmax_bins([slice_j(K + j) for j in range(K)],
                              min_bin_height)

    edge_w = sc.edges_from_bins(widths, x, B)
    edge_h = sc.edges_from_bins(heights, x, B)
    bin_w = [edge_w[k + 1] - edge_w[k] for k in range(K)]
    bin_h = [edge_h[k + 1] - edge_h[k] for k in range(K)]

    lams = [
        min_lambda + (1.0 - 2.0 * min_lambda)
        / (1.0 + jnp.exp(-slice_j(2 * K + j)))
        for j in range(K)
    ]
    one = jnp.ones_like(x)
    derivs = [one] + [
        min_derivative + jnp.logaddexp(slice_j(3 * K + j), 0.0)
        for j in range(K - 1)
    ] + [one]

    idx = sc.bin_index_ge(x, edge_h if inverse else edge_w, K)
    (sel_w, sel_h, sel_x0, sel_y0, sel_d0, sel_d1,
     sel_lam) = sc.select_by_index(
        idx, K, bin_w, bin_h, edge_w[:K], edge_h[:K],
        derivs[:K], derivs[1:], lams)

    out, lad = _lrs_eval_selected(
        x, sel_w, sel_h, sel_x0, sel_y0, sel_d0, sel_d1, sel_lam, inverse)

    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _lrs_eval_selected(x, sel_w, sel_h, sel_x0, sel_y0, sel_d0, sel_d1,
                       sel_lam, inverse):
    """LRS per-bin evaluation once the bin's parameters are selected —
    shared by the unpacked and packed spline stages (identical math, so
    both forms agree exactly downstream of the select)."""
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
    return out, lad


def _group_kron(go, gi, T, rel, dtype=jnp.float32):
    """kron(S, I_T) for a 0/1 group-relation matrix S, built IN-TRACE.

    ``S[a, b] = rel(a, b)`` over ``go`` output groups x ``gi`` input
    groups; the result is the [go*T, gi*T] block matrix with ``I_T`` at
    every (a, b) where ``rel`` holds. Constructed from ``broadcasted_iota``
    (not a numpy constant) so it is legal inside a ``pallas_call`` kernel —
    captured jnp constants are rejected there; iota is computed on-core.
    """
    rows, cols = go * T, gi * T
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    same_lane = (ri % T) == (ci % T)
    return (same_lane & rel(ri // T, ci // T)).astype(dtype)


def _group_index_col(K, T, dtype=jnp.int32):
    """[K*T, 1] column whose entry is the group index i // T (in-trace)."""
    return jax.lax.broadcasted_iota(dtype, (K * T, 1), 0) // T


def _fold_max(t, n, T):
    """Tree-max over n groups of T sublane rows: [nT, R] -> [T, R]."""
    while n > 1:
        m = n // 2
        lo = t[: m * T]
        hi = t[m * T: 2 * m * T]
        folded = jnp.maximum(lo, hi)
        if n % 2:
            folded = jnp.concatenate([folded, t[2 * m * T:]], axis=0)
            n = m + 1
        else:
            n = m
        t = folded
    return t


def _linear_TR(x_in, P, *, num_bins, T, inverse, tail_bound):
    """Unconstrained (linear-tail) piecewise-LINEAR spline on [T, R]
    tensors (Müller et al. 2018). ``P`` is [K*T, R], K-major: row group j
    holds unnormalized-pdf param j. Math mirrors
    ops/splines/linear.py:22-81 on the unit domain with the [-B, B]
    rescale of the unconstrained wrapper (linear.py:84-111); reference
    semantics nflows/transforms/splines/linear.py:38-105.
    """
    from nflows_tpu.ops.pallas import _spline_common as sc

    K = num_bins
    B = tail_bound
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    u = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)

    pdf = sc.softmax_bins([P[j * T:(j + 1) * T] for j in range(K)])
    # cdf[0..K], last forced to exactly 1 (linear.py:45-47)
    cdf = sc.running_cdf(pdf, u)

    if inverse:
        idx = sc.bin_index_ge(u, cdf, K)
        # equal-width bins: slope_k = (cdf[k+1]-cdf[k])*K,
        # offset_k = cdf[k+1] - slope_k*(k+1)/K  (linear.py:52-56)
        slopes = [(cdf[k + 1] - cdf[k]) * K for k in range(K)]
        offs = [cdf[k + 1] - slopes[k] * ((k + 1.0) / K) for k in range(K)]
        sel_slope, sel_off = sc.select_by_index(idx, K, slopes, offs)
        out_u = jnp.clip((u - sel_off) / sel_slope, 0.0, 1.0)
        lad = -jnp.log(sel_slope)
    else:
        bin_pos = u * K
        idx_f = jnp.clip(jnp.floor(bin_pos), 0.0, K - 1.0)
        alpha = bin_pos - idx_f
        idx = idx_f.astype(jnp.int32)
        sel_pdf, sel_cdf = sc.select_by_index(idx, K, pdf, cdf[:K])
        out_u = jnp.clip(sel_cdf + alpha * sel_pdf, 0.0, 1.0)
        lad = jnp.log(sel_pdf) + math.log(K)

    out = out_u * (2.0 * B) - B
    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _quadratic_TR(x_in, P, *, num_bins, T, inverse, tail_bound,
                  min_bin_width, min_bin_height):
    """Unconstrained (linear-tail) piecewise-QUADRATIC spline on [T, R]
    tensors (Müller et al. 2018). ``P`` is [(2K-1)*T, R], K-major: widths
    j<K, then the K-1 interior knot-height params (the linear-tails
    variant — boundary heights are solved so the normalized pdf is
    exactly 1 at both ends). Math mirrors ops/splines/quadratic.py:28-139;
    reference nflows/transforms/splines/quadratic.py:55-159.
    """
    from nflows_tpu.ops.pallas import _spline_common as sc

    K = num_bins
    B = tail_bound
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    u = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)

    def slice_j(j):
        return P[j * T:(j + 1) * T]

    w = sc.softmax_bins([slice_j(j) for j in range(K)], min_bin_width)

    h_int = [jnp.logaddexp(slice_j(K + j), 0.0) + 1e-3 for j in range(K - 1)]
    # boundary heights that normalize the trapezoid pdf to exactly 1
    # (quadratic.py:63-80)
    first_w = 0.5 * w[0]
    last_w = 0.5 * w[K - 1]
    numerator = 0.5 * first_w * h_int[0] + 0.5 * last_w * h_int[K - 2]
    for i in range(K - 2):
        numerator = numerator + 0.5 * (h_int[i] + h_int[i + 1]) * w[i + 1]
    constant = numerator / (1.0 - 0.5 * first_w - 0.5 * last_w)
    he = [constant] + h_int + [constant]            # K+1 knot heights

    area = 0.5 * (he[0] + he[1]) * w[0]
    for k in range(1, K):
        area = area + 0.5 * (he[k] + he[k + 1]) * w[k]
    inv_area = 1.0 / area
    hts = [min_bin_height + (1.0 - min_bin_height) * h * inv_area for h in he]

    # bin-left cdf (trapezoid areas) / locations, last pinned to exactly 1
    # (quadratic.py:89-97)
    cdf = sc.running_cdf(
        [0.5 * (hts[k] + hts[k + 1]) * w[k] for k in range(K)], u)
    loc = sc.running_cdf(w, u)

    idx = sc.bin_index_ge(u, cdf if inverse else loc, K)
    sel_loc, sel_w, sel_cdf, sel_hl, sel_hr = sc.select_by_index(
        idx, K, loc[:K], w, cdf[:K], hts[:K], hts[1:])

    a = 0.5 * (sel_hr - sel_hl) * sel_w
    b = sel_hl * sel_w
    c = sel_cdf

    if inverse:
        c_ = c - u
        disc = jnp.maximum(b * b - 4.0 * a * c_, 0.0)
        alpha = (-2.0 * c_) / (b + jnp.sqrt(disc))
        out_u = jnp.clip(alpha * sel_w + sel_loc, 0.0, 1.0)
        lad = -jnp.log(alpha * (sel_hr - sel_hl) + sel_hl)
    else:
        alpha = (u - sel_loc) / sel_w
        out_u = jnp.clip(a * alpha * alpha + b * alpha + c, 0.0, 1.0)
        lad = jnp.log(alpha * (sel_hr - sel_hl) + sel_hl)

    out = out_u * (2.0 * B) - B
    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _cubic_TR(x_in, P, *, num_bins, T, inverse, tail_bound,
              min_bin_width, min_bin_height):
    """Unconstrained (linear-tail) monotone CUBIC (Steffen) spline on
    [T, R] tensors. ``P`` is [(2K+2)*T, R], K-major: widths j<K, heights
    K<=j<2K, then one row group each for the left/right boundary
    derivative params. Math mirrors ops/splines/cubic.py:39-183 incl. the
    bisection+Newton inverse (the reference's Blinn closed forms NaN at
    fp32 — MIGRATION.md #7); reference semantics
    nflows/transforms/splines/cubic.py:63-267. The 30 bisection halvings
    unroll at trace time (no loop-carried refs — Mosaic-safe).
    """
    from nflows_tpu.ops.pallas import _spline_common as sc

    K = num_bins
    B = tail_bound
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    u = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)

    def slice_j(j):
        return P[j * T:(j + 1) * T]

    w = sc.softmax_bins([slice_j(j) for j in range(K)], min_bin_width)
    h = sc.softmax_bins([slice_j(K + j) for j in range(K)], min_bin_height)

    cumw = sc.running_cdf(w, u)
    cumh = sc.running_cdf(h, u)

    # Steffen monotone interior derivatives (cubic.py:85-103)
    slopes = [h[k] / w[k] for k in range(K)]
    derivs = [None] * (K + 1)
    sig0 = 1.0 / (1.0 + jnp.exp(-slice_j(2 * K)))
    sig1 = 1.0 / (1.0 + jnp.exp(-slice_j(2 * K + 1)))
    derivs[0] = sig0 * 3.0 * slopes[0]
    derivs[K] = sig1 * 3.0 * slopes[K - 1]
    for k in range(1, K):
        m1 = jnp.minimum(jnp.abs(slopes[k - 1]), jnp.abs(slopes[k]))
        m2 = 0.5 * (w[k] * slopes[k - 1] + w[k - 1] * slopes[k]) / (
            w[k - 1] + w[k])
        derivs[k] = jnp.minimum(m1, m2) * (
            jnp.sign(slopes[k - 1]) + jnp.sign(slopes[k]))

    # per-bin cubic y = a t^3 + b t^2 + c t + d (cubic.py:106-110)
    idx = sc.bin_index_ge(u, cumh if inverse else cumw, K)
    a_list = [(derivs[k] + derivs[k + 1] - 2.0 * slopes[k]) / (w[k] * w[k])
              for k in range(K)]
    b_list = [(3.0 * slopes[k] - 2.0 * derivs[k] - derivs[k + 1]) / w[k]
              for k in range(K)]
    sel_a, sel_b, sel_c, sel_d, sel_lw, sel_w = sc.select_by_index(
        idx, K, a_list, b_list, derivs[:K], cumh[:K], cumw[:K], w)

    if inverse:
        # branchless bisection (30 unrolled halvings) + one Newton step
        # (cubic.py:125-168); inference-only kernel, so the Newton
        # gradient re-attachment is kept for value stability only
        lo = jnp.zeros_like(u)
        hi = sel_w
        for _ in range(30):
            mid = 0.5 * (lo + hi)
            fmid = (((sel_a * mid + sel_b) * mid + sel_c) * mid
                    + sel_d - u)
            go_right = fmid < 0.0
            lo = jnp.where(go_right, mid, lo)
            hi = jnp.where(go_right, hi, mid)
        t_star = 0.5 * (lo + hi)
        deriv = 3.0 * sel_a * t_star * t_star + 2.0 * sel_b * t_star + sel_c
        f_val = (((sel_a * t_star + sel_b) * t_star + sel_c) * t_star
                 + sel_d - u)
        shifted = t_star - f_val / deriv
        out_u = jnp.clip(shifted + sel_lw, 0.0, 1.0)
        lad = -jnp.log(
            3.0 * sel_a * shifted * shifted + 2.0 * sel_b * shifted + sel_c)
    else:
        t = u - sel_lw
        out_u = jnp.clip(
            ((sel_a * t + sel_b) * t + sel_c) * t + sel_d, 0.0, 1.0)
        lad = jnp.log(3.0 * sel_a * t * t + 2.0 * sel_b * t + sel_c)

    out = out_u * (2.0 * B) - B
    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _packed_select(x, P, *, K, T, inverse, B, min_bin_width,
                   min_bin_height, min_derivative, deriv_offset):
    """Shared packed-sublane spline front half: softmax-normalize widths/
    heights, build bin edges, locate each sample's bin, and select that
    bin's parameters — all on the [K*T, R] packed block, with every
    structural move a ``kron(S, I_T)`` 0/1 matmul (see
    :func:`_rq_spline_TR_packed` for why). ``deriv_offset`` is the
    group index where the K-1 interior derivative rows start (2K for RQ,
    3K for LRS, whose lambdas occupy groups 2K..3K).

    Returns ``(sel, onehot, mm, Ms)``: ``sel`` holds the selected bin
    width ``xw``, height ``xh``, left edges ``cw``/``ch`` and boundary
    derivatives ``d0``/``d1`` as [T, R] tensors; ``onehot`` [K*T, R],
    ``mm``/``Ms`` let callers select extra per-bin fields
    (``mm(Ms, onehot * field)``).
    """
    KT = K * T
    f32 = jnp.float32
    true_ = lambda a, b: (a >= 0) | (b >= 0)             # all groups
    Mb = _group_kron(K, 1, T, true_)                     # [KT, T] bcast
    Ms = _group_kron(1, K, T, true_)                     # [T, KT] group-sum
    Lp = _group_kron(K, K, T, lambda a, b: a >= b)       # inclusive prefix
    Sdn = _group_kron(K, K, T, lambda a, b: a == b + 1)  # out k = in k-1
    Sup = _group_kron(K, K, T, lambda a, b: a + 1 == b)  # out k = in k+1
    Ms1 = _group_kron(1, K + 1, T, true_)                # [(K+1)T] group-sum
    gidx = _group_index_col(K, T)                        # [KT, 1]
    first = (gidx == 0).astype(f32)
    last = (gidx == K - 1).astype(f32)

    def mm(a, b):
        # Structural 0/1 matmuls CARRY fp32 VALUES (bin edges, the sample
        # broadcast, one-hot selects). On TPU the MXU truncates fp32
        # inputs to bf16 at DEFAULT precision, which moves bin edges by
        # ~1e-2 relative and lands samples in the wrong bin (measured
        # round-4: 0.25-class output errors + inverse NaNs on hardware,
        # while CPU tests pass — fp32 dots are exact there). HIGHEST keeps
        # the products fp32-exact. A cheaper 2-pass hi/lo bf16 split of
        # the value operand (exploiting the 0/1 left operand being
        # bf16-exact) was A/B'd on hardware: ~8% faster than HIGHEST
        # end-to-end but with 2-3x worse numerics (out err 1.1e-3 vs
        # 4.4e-4) — and BOTH lose to the unpacked form, so this opt-in
        # path keeps the best-numerics choice. Mosaic supports only
        # DEFAULT/HIGHEST in-kernel (HIGH raises NotImplementedError).
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)

    def normalize_packed(V, min_size):
        vmax = _fold_max(V, K, T)                        # [T, R]
        e = jnp.exp(V - mm(Mb, vmax))
        tot = mm(Ms, e)                                  # [T, R]
        return min_size + (1.0 - min_size * K) * e * mm(Mb, 1.0 / tot)

    w = normalize_packed(P[:KT], min_bin_width)          # [KT, R]
    h = normalize_packed(P[KT:2 * KT], min_bin_height)

    def edges_packed(bins):
        right = 2.0 * B * mm(Lp, bins) - B
        right = right + last * (B - right)               # exact B at k=K-1
        left = mm(Sdn, right)                            # exact copy of k-1
        left = left + first * (-B - left)                # exact -B at k=0
        return left, right

    left_w, right_w = edges_packed(w)
    left_h, right_h = edges_packed(h)
    bin_w = right_w - left_w
    bin_h = right_h - left_h

    one_T = jnp.ones((T, x.shape[1]), dtype=f32)
    do = deriv_offset * T
    d_int = min_derivative + jnp.logaddexp(P[do:do + (K - 1) * T], 0.0)
    derivs = jnp.concatenate([one_T, d_int, one_T], axis=0)  # [(K+1)T, R]

    xb = mm(Mb, x)                                       # [KT, R]
    search_left = left_h if inverse else left_w
    ge = (xb >= search_left).astype(f32)                 # ge[0] == 1 (clipped)
    onehot = ge - mm(Sup, ge)                            # exactly one-hot

    zero_T = jnp.zeros((T, x.shape[1]), dtype=f32)
    oh_d0 = jnp.concatenate([onehot, zero_T], axis=0)    # deriv group k
    oh_d1 = jnp.concatenate([zero_T, onehot], axis=0)    # deriv group k+1

    sel = dict(
        xw=mm(Ms, onehot * bin_w),
        xh=mm(Ms, onehot * bin_h),
        cw=mm(Ms, onehot * left_w),
        ch=mm(Ms, onehot * left_h),
        d0=mm(Ms1, oh_d0 * derivs),
        d1=mm(Ms1, oh_d1 * derivs),
    )
    return sel, onehot, mm, Ms


# --- structural sublane moves for the roll-based packed spline stage ---
#
# pltpu.roll / pltpu.repeat are the dedicated Mosaic sublane-move ops (no
# relayout search, unlike T-granularity concat networks — the round-3
# compile-hang class), but they have no evaluation or differentiation
# rules outside a Mosaic kernel. The helpers below are custom_vjp
# wrappers: inside a kernel-body trace (the `_mosaic_moves` flag, set by
# the kernel entry functions) they emit the pltpu ops; outside (tests
# call the spline functions as pure jnp) they fall back to jnp
# equivalents. Their VJPs are themselves structural moves, so the
# training kernels' in-kernel `jax.vjp` differentiates the packed stage
# without Mosaic ever seeing an underived primitive.

_PLTPU_MOVES = [False]


@contextlib.contextmanager
def _mosaic_moves(enable=True):
    prev = _PLTPU_MOVES[0]
    _PLTPU_MOVES[0] = enable
    try:
        yield
    finally:
        _PLTPU_MOVES[0] = prev


def _with_mosaic_moves(fn):
    """Decorator for Mosaic kernel bodies: trace structural moves as
    pltpu ops."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with _mosaic_moves(True):
            return fn(*args, **kwargs)
    return wrapper


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _roll_rows(x, shift):
    """Cyclic roll along rows (sublanes): out[i] = x[(i - shift) % n]."""
    if _PLTPU_MOVES[0]:
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.roll(x, shift, 0)
    return jnp.roll(x, shift, 0)


def _roll_rows_fwd(x, shift):
    return _roll_rows(x, shift), None


def _roll_rows_bwd(shift, _, g):
    n = g.shape[0]
    return (_roll_rows(g, (n - shift) % n),)


_roll_rows.defvjp(_roll_rows_fwd, _roll_rows_bwd)


def _group_sum_tree(V, n, T):
    """[nT, R] -> [T, R]: sum over n groups by a halving tree (the
    `_fold_max` pattern — unaligned sublane slices + adds)."""
    while n > 1:
        m = n // 2
        lo = V[:m * T] + V[m * T:2 * m * T]
        if n % 2:
            lo = jnp.concatenate([lo[:T] + V[2 * m * T:], lo[T:]], axis=0)
        V, n = lo, m
    return V


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _tile_groups(x, K, T):
    """[T, R] -> [KT, R]: K stacked copies (kron(ones(K,1), I_T) @ x)."""
    if _PLTPU_MOVES[0]:
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.repeat(x, K, 0)
    return jnp.concatenate([x] * K, axis=0)


def _tile_groups_fwd(x, K, T):
    return _tile_groups(x, K, T), None


def _tile_groups_bwd(K, T, _, g):
    return (_group_sum_tree(g, K, T),)


_tile_groups.defvjp(_tile_groups_fwd, _tile_groups_bwd)


def _packed_select_roll(x, P, *, K, T, inverse, B, min_bin_width,
                        min_bin_height, min_derivative, deriv_offset):
    """Packed-sublane spline front half with VPU-exact structural moves.

    Third attack on the megakernel's skinny-[T, R] elementwise floor
    (round-5; rounds 2-4 history in :func:`_rq_spline_TR_packed`). Same
    selection semantics as :func:`_packed_select`, but every structural
    move is an exact-COPY vector op instead of a ``kron(S, I_T)`` matmul:

    - group broadcast = ``pltpu.repeat`` ([T, R] tiled K times),
    - inclusive prefix-sum = Hillis-Steele over ``pltpu.roll`` sublane
      shifts with iota masks zeroing the wrapped groups,
    - the one-group edge shift = a single roll (its wrapped group is
      overwritten by the exact boundary fix),
    - one-hot select-reduce = one-hot multiply + halving tree-sum over
      groups (unaligned sublane slices, the `_fold_max` pattern).

    Rolls and repeats move fp32 values bit-untouched, so bin-edge
    consistency (left edge of bin k == right edge of bin k-1, exactly)
    holds like the matmul form — WITHOUT the ``Precision.HIGHEST`` tax
    that made that form a measured net loss on hardware (DESIGN.md 3a,
    round 4). Sums still reassociate (tree/prefix order vs the unpacked
    running order), so results may differ from the unpacked variant by
    ~1 ulp, same as the matmul form.
    """
    KT = K * T
    f32 = jnp.float32
    gidx = jax.lax.broadcasted_iota(jnp.int32, (KT, 1), 0) // T
    first = (gidx == 0).astype(f32)
    last = (gidx == K - 1).astype(f32)

    def group_prefix(V):
        # inclusive prefix over K groups, LEFT-ASSOCIATED: K-1 dependent
        # masked-roll steps give e[k] = b[k] + (b[k-1] + (... + b[0])),
        # which is bitwise the unpacked running sum (fp add commutes, and
        # the pairings coincide by induction) — so bin edges here equal
        # the unpacked form's edges EXACTLY, not just to reassociation
        # tolerance (a log-step Hillis-Steele prefix was measurably
        # cheaper but flipped ~0.5% of near-edge elements into the
        # neighboring bin vs the unpacked chain)
        e = V
        for _ in range(K - 1):
            e = V + jnp.where(gidx >= 1, _roll_rows(e, T), 0.0)
        return e

    def normalize_packed(V, min_size):
        # vmax: max is exactly associative, the halving tree is safe;
        # total: left-associated running sum over group slices, matching
        # the unpacked softmax bit-for-bit
        vmax = _fold_max(V, K, T)                        # [T, R]
        e = jnp.exp(V - _tile_groups(vmax, K, T))
        tot = e[:T]
        for k in range(1, K):
            tot = tot + e[k * T:(k + 1) * T]
        return (min_size
                + (1.0 - min_size * K) * e * _tile_groups(1.0 / tot, K, T))

    w = normalize_packed(P[:KT], min_bin_width)          # [KT, R]
    h = normalize_packed(P[KT:2 * KT], min_bin_height)

    def edges_packed(bins):
        right = 2.0 * B * group_prefix(bins) - B
        right = right + last * (B - right)               # exact B at k=K-1
        left = _roll_rows(right, T)                      # exact copy of k-1
        left = left + first * (-B - left)                # exact -B at k=0
        return left, right

    left_w, right_w = edges_packed(w)
    left_h, right_h = edges_packed(h)
    bin_w = right_w - left_w
    bin_h = right_h - left_h

    one_T = jnp.ones((T, x.shape[1]), dtype=f32)
    do = deriv_offset * T
    d_int = min_derivative + jnp.logaddexp(P[do:do + (K - 1) * T], 0.0)
    derivs_lo = jnp.concatenate([one_T, d_int], axis=0)  # group k -> d_k
    derivs_hi = jnp.concatenate([d_int, one_T], axis=0)  # group k -> d_{k+1}

    xb = _tile_groups(x, K, T)                           # [KT, R]
    search_left = left_h if inverse else left_w
    ge = (xb >= search_left).astype(f32)                 # ge[0] == 1 (clipped)
    up = _roll_rows(ge, KT - T)                          # group k <- k+1
    onehot = ge - jnp.where(gidx == K - 1, 0.0, up)      # exactly one-hot

    def select(field):
        return _group_sum_tree(onehot * field, K, T)

    sel = dict(
        xw=select(bin_w),
        xh=select(bin_h),
        cw=select(left_w),
        ch=select(left_h),
        d0=select(derivs_lo),
        d1=select(derivs_hi),
    )
    return sel, select


def _rq_spline_TR_packed_roll(x_in, P, *, num_bins, T, inverse, tail_bound,
                              min_bin_width, min_bin_height,
                              min_derivative):
    """RQ spline, K-bin axis packed on sublanes, roll-based structure.

    :func:`_packed_select_roll` front half + the shared
    :func:`_rq_eval_selected` tail. Toggle:
    ``config.packed_spline_select('roll')``.
    """
    K = num_bins
    if K < 2:
        return _rq_spline_TR(
            x_in, P, num_bins=num_bins, T=T, inverse=inverse,
            tail_bound=tail_bound, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative)
    B = tail_bound
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    sel, _ = _packed_select_roll(
        x, P, K=K, T=T, inverse=inverse, B=B,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, deriv_offset=2 * K)

    out, lad = _rq_eval_selected(x, sel["xw"], sel["xh"], sel["cw"],
                                 sel["ch"], sel["d0"], sel["d1"], inverse)

    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _lrs_spline_TR_packed_roll(x_in, P, *, num_bins, T, inverse,
                               tail_bound, min_bin_width, min_bin_height,
                               min_derivative, min_lambda):
    """Linear-rational spline, packed sublanes, roll-based structure —
    the LRS counterpart of :func:`_rq_spline_TR_packed_roll` (packed
    lambda select via the returned ``select``; evaluation is the shared
    :func:`_lrs_eval_selected`)."""
    K = num_bins
    if K < 2:
        return _lrs_spline_TR(
            x_in, P, num_bins=num_bins, T=T, inverse=inverse,
            tail_bound=tail_bound, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative,
            min_lambda=min_lambda)
    B = tail_bound
    KT = K * T
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    sel, select = _packed_select_roll(
        x, P, K=K, T=T, inverse=inverse, B=B,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, deriv_offset=3 * K)

    lams = min_lambda + (1.0 - 2.0 * min_lambda) / (
        1.0 + jnp.exp(-P[2 * KT:3 * KT]))                # [KT, R]
    sel_lam = select(lams)

    out, lad = _lrs_eval_selected(
        x, sel["xw"], sel["xh"], sel["cw"], sel["ch"],
        sel["d0"], sel["d1"], sel_lam, inverse)

    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _lrs_spline_TR_packed(x_in, P, *, num_bins, T, inverse, tail_bound,
                          min_bin_width, min_bin_height, min_derivative,
                          min_lambda):
    """Linear-rational spline with the K-bin axis packed on sublanes —
    the LRS counterpart of :func:`_rq_spline_TR_packed` (same packed
    front half via :func:`_packed_select`, plus a packed lambda select;
    the per-bin evaluation is the exact :func:`_lrs_eval_selected` shared
    with the unpacked form, so the two variants differ only by
    reassociation in the select stage)."""
    K = num_bins
    if K < 2:
        return _lrs_spline_TR(
            x_in, P, num_bins=num_bins, T=T, inverse=inverse,
            tail_bound=tail_bound, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative,
            min_lambda=min_lambda)
    B = tail_bound
    KT = K * T
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    sel, onehot, mm, Ms = _packed_select(
        x, P, K=K, T=T, inverse=inverse, B=B,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, deriv_offset=3 * K)

    lams = min_lambda + (1.0 - 2.0 * min_lambda) / (
        1.0 + jnp.exp(-P[2 * KT:3 * KT]))                # [KT, R]
    sel_lam = mm(Ms, onehot * lams)

    out, lad = _lrs_eval_selected(
        x, sel["xw"], sel["xh"], sel["cw"], sel["ch"],
        sel["d0"], sel["d1"], sel_lam, inverse)

    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _rq_spline_TR_packed(x_in, P, *, num_bins, T, inverse, tail_bound,
                         min_bin_width, min_bin_height, min_derivative):
    """RQ spline on [T, R] tensors with the K-bin axis PACKED on sublanes.

    Same math/semantics as :func:`_rq_spline_TR`, restructured for the
    VPU: the round-2 cost anatomy (BASELINE.md) showed the megakernel
    bound by ~O(K) chains of skinny [T, R] elementwise ops at T=3 (3/8
    sublanes); here the softmax, edge construction, bin search and select
    all operate on the [K*T, R] packed block at full sublane utilization,
    and every *structural* move — group broadcast, prefix-sum, one-group
    shift, one-hot select-reduce — is a tiny stationary ``kron(S, I_T)``
    matmul on the MXU instead of a concat/shift network on the VPU (the
    concat-shift form of the packed select hangs this toolchain's Mosaic
    compiler — bisected in DESIGN.md round 3; matmuls lower robustly).

    Numerics: reductions reassociate (tree max / MXU accumulation), so
    results can differ from the unpacked variant by ~1 ulp; bin-edge
    consistency is exact because adjacent-group left/right edges are
    bit-identical copies (0/1 shift matrices), so every sample lands in
    exactly one bin. The structural matmuls must run at HIGHEST precision
    (see ``mm`` in :func:`_packed_select`) — at the MXU's DEFAULT bf16
    truncation they move bin edges enough to land samples in the wrong
    bin on hardware.

    Round-4 verdict (BASELINE.md "Packed-sublane A/B"): once the
    structural matmuls are value-exact, the packed form measures ~28%
    SLOWER end-to-end than the unpacked skinny chain at the flagship
    K=8/T=3 (bench_fused_nsf, 262k samples: 59.8 ms unpacked vs 76.5 ms
    packed-HIGHEST; a 2-pass hi/lo bf16 split recovers ~8% of that but
    has 2-3x worse numerics) — the round-3 1.6x "win" was an artifact of
    the then-broken truncated math, which timed the same as unpacked.
    The path stays opt-in and correct; the sublane ceiling stands, now
    with a measured explanation.
    """
    K = num_bins
    if K < 2:
        return _rq_spline_TR(
            x_in, P, num_bins=num_bins, T=T, inverse=inverse,
            tail_bound=tail_bound, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative)
    B = tail_bound
    x_orig = x_in
    inside = (x_orig >= -B) & (x_orig <= B)
    x = jnp.clip(x_orig, -B, B)

    sel, _, _, _ = _packed_select(
        x, P, K=K, T=T, inverse=inverse, B=B,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, deriv_offset=2 * K)

    out, lad = _rq_eval_selected(x, sel["xw"], sel["xh"], sel["cw"],
                                 sel["ch"], sel["d0"], sel["d1"], inverse)

    out = jnp.where(inside, out, x_orig)
    lad = jnp.where(inside, lad, jnp.zeros_like(lad))
    return out, lad


def _affine_TR(x_in, P, *, num_bins, T, inverse, scale_act):
    """RealNVP affine / NICE additive coupling on [T, R] tensors.

    ``P`` rows follow the model's own layout (transforms/coupling.py:178-181:
    shift first, unconstrained scale second): P[:T] = shift, P[T:2T] =
    unconstrained scale (absent for additive). ``scale_act`` selects the
    reference's scale activation (coupling.py:152-159): "default" =
    sigmoid(x+2)+1e-3, "general" = clip(softplus+1e-3, 0, 3), "none" =
    additive (scale 1, logabsdet 0).
    """
    del num_bins
    shift = P[:T]
    if scale_act == "none":
        out = x_in - shift if inverse else x_in + shift
        return out, jnp.zeros_like(x_in)
    raw = P[T:2 * T]
    if scale_act == "default":
        scale = 1.0 / (1.0 + jnp.exp(-(raw + 2.0))) + 1e-3
    elif scale_act == "general":
        scale = jnp.clip(jnp.logaddexp(raw, 0.0) + 1e-3, 0.0, 3.0)
    else:
        raise ValueError(f"unknown scale_act {scale_act!r}")
    log_scale = jnp.log(scale)
    if inverse:
        return (x_in - shift) / scale, -log_scale
    return x_in * scale + shift, log_scale


def _fat_TR(fn):
    """Full-sublane ('fat') relayout wrapper for an elementwise [T, R]
    spline stage: reshape x [T, R] -> [T*R/128, 128] and P's stacked
    param rows the same way, run the UNCHANGED spline at T' = T*R/128,
    reshape back. Every spline family here is purely per-element with
    per-element params (no cross-element reductions), and the row-major
    reshape keeps each element paired with its own param rows, so the
    result is BIT-IDENTICAL to the unpacked chain — only the vector
    layout changes: [3, R] tiles use 3 of 8 sublanes per vreg; [24, 128]
    uses all 8 (measured 1616 vs 514 Gelem-op/s dependent-chain rate,
    benchmarks/vpu_roofline.py). The round-2 blocker — Mosaic hanging on
    in-kernel lane->sublane reshapes — is gone on the current toolchain
    (63.8 s compile, bit-exact, /tmp probe 2026-08-20; re-pin with
    benchmarks/mosaic_bisect.py if a toolchain change regresses it)."""
    @functools.wraps(fn)
    def wrapper(x_in, P, *, T, **kw):
        R = x_in.shape[1]
        if R % 128 or R == 128:
            return fn(x_in, P, T=T, **kw)
        F = R // 128
        out, lad = fn(x_in.reshape(T * F, 128), P.reshape(-1, 128),
                      T=T * F, **kw)
        return out.reshape(T, R), lad.reshape(T, R)
    return wrapper


_SPLINES_TR = {"rq": _rq_spline_TR, "lrs": _lrs_spline_TR,
               "rq_packed": _rq_spline_TR_packed,
               "lrs_packed": _lrs_spline_TR_packed,
               "rq_packed_roll": _rq_spline_TR_packed_roll,
               "lrs_packed_roll": _lrs_spline_TR_packed_roll,
               "affine": _affine_TR, "additive": _affine_TR,
               "linear": _linear_TR, "quadratic": _quadratic_TR,
               "cubic": _cubic_TR}
for _fam in ("rq", "lrs", "linear", "quadratic", "cubic"):
    _SPLINES_TR[f"{_fam}_fat"] = _fat_TR(_SPLINES_TR[_fam])


def _lane_split_env():
    """Parse the experimental NFLOWS_TPU_LANE_SPLIT knob (positive int,
    default 1) with a clear error instead of a bare int()/ZeroDivision
    failure at trace time."""
    raw = os.environ.get("NFLOWS_TPU_LANE_SPLIT", "1")
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(
            f"NFLOWS_TPU_LANE_SPLIT must be a positive integer; got "
            f"{raw!r}") from None
    if val < 1:
        raise ValueError(
            f"NFLOWS_TPU_LANE_SPLIT must be >= 1; got {val}")
    return val


def _packed_spline_name(family, style):
    """Resolve the kernel spline name for a packed-select style.

    ``style``: falsy = unpacked; ``'fat'`` = full-sublane relayout of
    the unchanged spline (:func:`_fat_TR`); ``'roll'`` = roll/repeat
    structural moves (:func:`_packed_select_roll`); ``'mm'``/``True`` =
    the kron(S, I_T) HIGHEST-precision matmul form
    (:func:`_packed_select`). Families without a variant stay
    unpacked."""
    if not style:
        return family
    suffix = {"roll": "_packed_roll", "fat": "_fat"}.get(style, "_packed")
    name = f"{family}{suffix}"
    return name if name in _SPLINES_TR else family


@_with_mosaic_moves
def _kernel(x_ref, ctx_ref, w0_hbm, b0_hbm, wb_hbm, bb_hbm, wf_hbm, bf_hbm,
            wc0_hbm, wcb_hbm, bcb_hbm,
            out_ref, lad_ref,
            w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
            wc0_v, wcb_v, bcb_v, dma_sems, *,
            layer_indices, num_bins, num_blocks, inverse, H, TM, spline,
            spline_kw, has_context, wh_scale=None, lane_split=1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Load all layer weights HBM -> persistent VMEM scratch once (step 0).
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        pairs = [(w0_hbm, w0_v), (b0_hbm, b0_v), (wb_hbm, wb_v),
                 (bb_hbm, bb_v), (wf_hbm, wf_v), (bf_hbm, bf_v)]
        if has_context:
            pairs += [(wc0_hbm, wc0_v), (wcb_hbm, wcb_v), (bcb_hbm, bcb_v)]
        wait_dmas(start_weight_dmas(pairs, dma_sems))

    L = len(layer_indices)
    x = x_ref[...].astype(jnp.float32)      # [D, R]
    ctx = ctx_ref[...].astype(jnp.float32) if has_context else None  # [C, R]

    # lane_split=2: run the layer chain on two independent lane halves,
    # interleaved per layer, so the scheduler can overlap one half's
    # conditioner GEMMs (MXU) with the other half's spline chain (VPU) —
    # the round-5 roofline's remaining lever (perfect overlap floor 6 ms
    # vs 9.8 ms measured). Pure program reordering: results are
    # bit-identical to split=1 (each half's math is untouched).
    split = lane_split if x.shape[1] % (128 * lane_split) == 0 else 1
    R = x.shape[1]
    Rh = R // split
    xs = [x[:, h * Rh:(h + 1) * Rh] for h in range(split)]
    ctxs = [None if ctx is None else ctx[:, h * Rh:(h + 1) * Rh]
            for h in range(split)]
    lads = [jnp.zeros((1, Rh), dtype=jnp.float32) for _ in range(split)]

    order = range(L - 1, -1, -1) if inverse else range(L)
    for l in order:
        li = layer_indices[l]
        T = len(li.tr_idx)
        for h in range(split):
            if inverse:
                identity = _take_rows(xs[h], li.id_idx)
                transform = _take_rows(xs[h], li.tr_idx)
            else:
                identity = _take_rows(xs[h], li.id_rows)
                transform = _take_rows(xs[h], li.tr_rows)

            P = _conditioner(identity, l, w0_v, b0_v, wb_v, bb_v, wf_v,
                             bf_v, num_blocks, H, TM, ctx=ctxs[h],
                             wc0_v=wc0_v, wcb_v=wcb_v, bcb_v=bcb_v)
            if wh_scale is not None:
                # softmax 1/sqrt(hidden) width/height rescale applied
                # in-kernel (training keeps weights UNfolded so the
                # kernel-layout params are elementwise-optimizer-
                # equivalent to the model's own)
                KT2 = 2 * num_bins * T
                P = jnp.concatenate([P[:KT2] * wh_scale, P[KT2:]], axis=0)
            out, lad = _SPLINES_TR[spline](
                transform, P, num_bins=num_bins, T=T, inverse=inverse,
                **spline_kw,
            )
            lads[h] = lads[h] + jnp.sum(lad, axis=0, keepdims=True)
            both = jnp.concatenate([identity, out], axis=0)
            xs[h] = _take_rows(both,
                               li.merge_inv if inverse else li.merge_fwd)

    out_ref[...] = xs[0] if split == 1 else jnp.concatenate(xs, axis=1)
    lad_ref[...] = (lads[0] if split == 1
                    else jnp.concatenate(lads, axis=1))


def nsf_flow_kernel_call(
    x_t: jnp.ndarray,                 # [D, N] fp32, N multiple of lanes
    w0: jnp.ndarray,                  # [L, H, Tid]   (pre-transposed)
    b0: jnp.ndarray,                  # [L, H, 1] fp32
    wb: jnp.ndarray,                  # [L, 2*num_blocks, H, H] (pre-transposed)
    bb: jnp.ndarray,                  # [L, 2*num_blocks, H, 1] fp32
    wf: jnp.ndarray,                  # [L, TM, H] (pre-transposed, K-major
    bf: jnp.ndarray,                  #  rows, softmax scale folded in)
    layer_indices,                    # tuple of NSFLayerIndices (static)
    *,
    inverse: bool,
    num_blocks: int,
    num_bins: int = 0,                # spline families only
    tail_bound: float = None,
    min_bin_width: float = None,
    min_bin_height: float = None,
    min_derivative: float = None,
    spline: str = "rq",
    min_lambda: float = None,
    scale_act: str = None,            # affine-coupling scale activation
    lanes: int = LANES_DEFAULT,
    interpret: bool = False,
    ctx_t: jnp.ndarray = None,        # [C, N] per-sample context (optional)
    wc0: jnp.ndarray = None,          # [L, H, C] initial-layer context cols
    wcb: jnp.ndarray = None,          # [L, num_blocks, H, C] GLU projections
    bcb: jnp.ndarray = None,          # [L, num_blocks, H, 1] fp32
    wh_scale: float = None,           # in-kernel width/height rescale
    packed_select: bool = None,       # packed-sublane spline stage (None =
                                      # config.packed_spline_select())
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused chain. Returns (y_t [D, N], logabsdet [1, N])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, N = x_t.shape
    L, H, _ = w0.shape
    TM = wf.shape[1]
    if N % lanes:
        raise ValueError(f"N={N} must be a multiple of lanes={lanes}")
    grid = (N // lanes,)

    # flatten stacks to 2-D for the in-kernel static row-range addressing
    w0 = w0.reshape(L * H, -1)
    b0 = b0.reshape(L * H, 1)
    wb = wb.reshape(-1, H)
    bb = bb.reshape(-1, 1)
    wf = wf.reshape(L * TM, H)
    bf = bf.reshape(L * TM, 1)

    has_context = ctx_t is not None
    if has_context:
        if wc0 is None or wcb is None or bcb is None:
            raise ValueError("ctx_t requires wc0/wcb/bcb context weights")
        if ctx_t.shape[1] != N:
            raise ValueError(
                f"ctx_t has {ctx_t.shape[1]} samples but x_t has {N}")
        C = ctx_t.shape[0]
        wc0 = wc0.reshape(L * H, C)
        wcb = wcb.reshape(-1, C)
        bcb = bcb.reshape(-1, 1)
    else:
        # 1-row dummies keep the pallas_call signature static; the kernel
        # never touches them (has_context=False skips their DMA and use)
        C = 1
        ctx_t = jnp.zeros((1, N), dtype=jnp.float32)
        wc0 = jnp.zeros((1, 1), dtype=w0.dtype)
        wcb = jnp.zeros((1, 1), dtype=w0.dtype)
        bcb = jnp.zeros((1, 1), dtype=jnp.float32)

    families = ("rq", "lrs", "linear", "quadratic", "cubic",
                "affine", "additive")
    if spline not in families:
        raise ValueError(f"spline must be one of {sorted(families)}")
    if spline in ("affine", "additive"):
        if wh_scale is not None:
            raise ValueError(
                "wh_scale is a spline softmax rescale; invalid for "
                f"spline={spline!r}")
        if spline == "additive":
            scale_act = "none"
        elif scale_act not in ("default", "general"):
            raise ValueError(
                "spline='affine' requires scale_act 'default' or 'general'")
        spline_kw = dict(scale_act=scale_act)
    elif spline == "linear":
        if tail_bound is None or num_bins < 1:
            raise ValueError("spline='linear' requires num_bins/tail_bound")
        spline_kw = dict(tail_bound=tail_bound)
    elif spline in ("quadratic", "cubic"):
        if None in (tail_bound, min_bin_width, min_bin_height) \
                or num_bins < 2:
            raise ValueError(
                f"spline={spline!r} requires num_bins/tail_bound/"
                "min_bin_width/min_bin_height")
        spline_kw = dict(tail_bound=tail_bound,
                         min_bin_width=min_bin_width,
                         min_bin_height=min_bin_height)
    else:
        if None in (tail_bound, min_bin_width, min_bin_height,
                    min_derivative) or num_bins < 1:
            raise ValueError(
                f"spline={spline!r} requires num_bins/tail_bound/"
                "min_bin_width/min_bin_height/min_derivative")
        spline_kw = dict(
            tail_bound=tail_bound, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative,
        )
        if spline == "lrs":
            if min_lambda is None:
                raise ValueError("min_lambda is required for spline='lrs'")
            spline_kw["min_lambda"] = min_lambda
    if spline not in ("affine", "additive"):
        # style resolution applies to EVERY spline family ('fat' exists
        # for all five; packed variants for rq/lrs only — families
        # without the requested variant stay unpacked)
        if packed_select is None:
            # serving default: 'fat' (bit-identical, 4-6% faster
            # device-only — BASELINE.md round 5); training callers pass
            # their resolved style explicitly
            from nflows_tpu import config
            packed_select = config._packed_spline_style("serving")
        spline = _packed_spline_name(spline, packed_select)
    kernel = functools.partial(
        _kernel,
        layer_indices=tuple(layer_indices),
        num_bins=num_bins,
        num_blocks=num_blocks,
        inverse=inverse,
        H=H,
        TM=TM,
        spline=spline,
        spline_kw=spline_kw,
        has_context=has_context,
        wh_scale=wh_scale,
        # experimental MXU/VPU overlap knob (round 5): interleave two
        # independent lane-half chains per grid step; bit-identical
        # (measured SLOWER at split=2 — BASELINE.md round 5)
        lane_split=_lane_split_env(),
    )

    # weights pinned to HBM (BlockSpec'd VMEM inputs would be
    # double-buffered) and DMA'd to single-buffered scratch once
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)

    out, lad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm,
        ],
        out_specs=[
            pl.BlockSpec((D, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(w0.shape, w0.dtype),
            pltpu.VMEM(b0.shape, b0.dtype),
            pltpu.VMEM(wb.shape, wb.dtype),
            pltpu.VMEM(bb.shape, bb.dtype),
            pltpu.VMEM(wf.shape, wf.dtype),
            pltpu.VMEM(bf.shape, bf.dtype),
            pltpu.VMEM(wc0.shape, wc0.dtype),
            pltpu.VMEM(wcb.shape, wcb.dtype),
            pltpu.VMEM(bcb.shape, bcb.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # resident weights + per-layer temporaries exceed the 16 MB
            # default scoped-vmem budget; v5e has headroom above it
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_t, ctx_t, w0, b0, wb, bb, wf, bf, wc0, wcb, bcb)
    return out, lad
