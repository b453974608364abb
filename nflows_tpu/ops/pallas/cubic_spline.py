"""Pallas-fused monotone-cubic spline kernel (forward and inverse).

Same design as ops/pallas/rq_spline.py: element axis on lanes, bin params
[K, N], everything — width/height softmax, Steffen monotone derivatives,
per-bin cubic coefficients, bin search, select, cubic evaluation /
root-solve inverse, logabsdet, linear tails — in one VMEM pass. This
completes fused-kernel coverage of all five spline families (linear,
quadratic, cubic, rational-quadratic, linear-rational).

The inverse differs deliberately from the XLA path's Blinn three-case
closed forms (ops/splines/cubic.py): those need atan2/cbrt, which this
toolchain's Mosaic does not lower. The in-bin cubic CDF piece is monotone,
so its unique in-bin root is found by 30 branchless bisection halvings —
fp32-exact, mul/add/select only, and uniform across the one-root /
three-root / near-quadratic regimes.

Gradients: ``custom_vjp`` via the XLA implementation, training exact.
Reference semantics: nflows/transforms/splines/cubic.py:63-267.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.splines import cubic as cub_ref

__all__ = ["cubic_spline_pallas"]

_LANES = 128
_ROWS = 64
_TILE = _LANES * _ROWS


def _kernel(x_ref, w_ref, h_ref, dl_ref, dr_ref, out_ref, lad_ref, *,
            num_bins, inverse, tail_bound, min_bin_width, min_bin_height):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                       # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)      # normalized [0, 1]

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

    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)

    def edges_of(bins):
        edges = [zero]
        run = zero
        for k in range(K):
            run = run + bins[k]
            edges.append(run)
        edges[-1] = one
        return edges

    cumw = edges_of(widths)
    cumh = edges_of(heights)

    slopes = [heights[k] / widths[k] for k in range(K)]
    # Steffen monotone interior derivatives (reference cubic.py:113-132)
    derivs = [jax.nn.sigmoid(dl_ref[0]) * 3.0 * slopes[0]]
    for k in range(1, K):
        m1 = jnp.minimum(jnp.abs(slopes[k - 1]), jnp.abs(slopes[k]))
        m2 = 0.5 * (widths[k] * slopes[k - 1] + widths[k - 1] * slopes[k]) / (
            widths[k - 1] + widths[k])
        derivs.append(jnp.minimum(m1, m2)
                      * (jnp.sign(slopes[k - 1]) + jnp.sign(slopes[k])))
    derivs.append(jax.nn.sigmoid(dr_ref[0]) * 3.0 * slopes[K - 1])

    # per-bin cubic coefficients y = a t^3 + b t^2 + c t + d
    a = [(derivs[k] + derivs[k + 1] - 2.0 * slopes[k]) / (widths[k] ** 2)
         for k in range(K)]
    b = [(3.0 * slopes[k] - 2.0 * derivs[k] - derivs[k + 1]) / widths[k]
         for k in range(K)]
    c = [derivs[k] for k in range(K)]
    d = [cumh[k] for k in range(K)]

    # bin search + select
    search = cumh if inverse else cumw
    idx = jnp.zeros_like(x, dtype=jnp.int32)
    for k in range(1, K):
        idx = idx + (x >= search[k]).astype(jnp.int32)

    sa, sb, sc, sd = a[0], b[0], c[0], d[0]
    left_w, right_w = cumw[0], cumw[1]
    for k in range(1, K):
        m = idx == k
        sa = jnp.where(m, a[k], sa)
        sb = jnp.where(m, b[k], sb)
        sc = jnp.where(m, c[k], sc)
        sd = jnp.where(m, d[k], sd)
        left_w = jnp.where(m, cumw[k], left_w)
        right_w = jnp.where(m, cumw[k + 1], right_w)

    if inverse:
        # The in-bin cubic CDF piece is monotone increasing, so the wanted
        # root is unique in [0, bin_width]: solve by branchless bisection.
        # (The XLA path's Blinn closed forms need atan2/cbrt, which this
        # toolchain's Mosaic does not lower; 30 halvings are fp32-exact
        # and use only mul/add/select, uniformly across the one-root /
        # three-root / near-quadratic cases.)
        w_bin = right_w - left_w

        def halve(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            fmid = ((sa * mid + sb) * mid + sc) * mid + sd - x
            go_right = fmid < 0.0
            return (jnp.where(go_right, mid, lo),
                    jnp.where(go_right, hi, mid))

        lo, hi = jax.lax.fori_loop(
            0, 30, halve, (jnp.zeros_like(x), w_bin))
        # one Newton polish (matches ops/splines/cubic.py's root accuracy)
        t_star = 0.5 * (lo + hi)
        deriv = 3.0 * sa * t_star * t_star + 2.0 * sb * t_star + sc
        f_val = ((sa * t_star + sb) * t_star + sc) * t_star + sd - x
        shifted = t_star - f_val / deriv
        out01 = shifted + left_w
        lad = -jnp.log(3.0 * sa * shifted * shifted + 2.0 * sb * shifted + sc)
    else:
        shifted = x - left_w
        out01 = ((sa * shifted + sb) * shifted + sc) * shifted + sd
        lad = jnp.log(3.0 * sa * shifted * shifted + 2.0 * sb * shifted + sc)

    out = jnp.clip(out01, 0.0, 1.0) * (2.0 * B) - B
    out_ref[...] = jnp.where(inside, out, x_orig)
    lad_ref[...] = jnp.where(inside, lad, jnp.zeros_like(lad))


def _pallas_impl(x_flat, w_t, h_t, dl_t, dr_t, *, num_bins, inverse,
                 tail_bound, min_bin_width, min_bin_height, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x_flat.shape[0]
    M = N // _LANES
    grid = (M // _ROWS,)

    x2 = x_flat.reshape(M, _LANES)
    w2 = w_t.reshape(num_bins, M, _LANES)
    h2 = h_t.reshape(num_bins, M, _LANES)
    dl2 = dl_t.reshape(1, M, _LANES)
    dr2 = dr_t.reshape(1, M, _LANES)

    kernel = functools.partial(
        _kernel, num_bins=num_bins, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
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
        in_specs=[spec(None), spec(num_bins), spec(num_bins), spec(1),
                  spec(1)],
        out_specs=[spec(None), spec(None)],
        out_shape=[
            jax.ShapeDtypeStruct((M, _LANES), x_flat.dtype),
            jax.ShapeDtypeStruct((M, _LANES), x_flat.dtype),
        ],
        interpret=interpret,
    )(x2, w2, h2, dl2, dr2)
    return out.reshape(N), lad.reshape(N)


def _reference(inputs, uw, uh, dl, dr, inverse, tail_bound, min_bin_width,
               min_bin_height, eps, quadratic_threshold):
    return cub_ref.unconstrained_cubic_spline(
        inputs, uw, uh, dl, dr, inverse=inverse, tails="linear",
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, eps=eps,
        quadratic_threshold=quadratic_threshold,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _cubic_pallas_core(inputs, uw, uh, dl, dr, inverse, tail_bound,
                       min_bin_width, min_bin_height, eps,
                       quadratic_threshold, interpret):
    """inputs [...]; uw/uh [..., K]; dl/dr [..., 1]."""
    shape = inputs.shape
    K = uw.shape[-1]
    N = int(np.prod(shape))

    x = inputs.reshape(N)
    w_t = uw.reshape(N, K).T
    h_t = uh.reshape(N, K).T
    dl_t = dl.reshape(N, 1).T
    dr_t = dr.reshape(N, 1).T

    pad_n = (-N) % _TILE
    if pad_n:
        x = jnp.pad(x, (0, pad_n))
        w_t = jnp.pad(w_t, ((0, 0), (0, pad_n)))
        h_t = jnp.pad(h_t, ((0, 0), (0, pad_n)))
        dl_t = jnp.pad(dl_t, ((0, 0), (0, pad_n)))
        dr_t = jnp.pad(dr_t, ((0, 0), (0, pad_n)))

    out, lad = _pallas_impl(
        x, w_t, h_t, dl_t, dr_t, num_bins=K, inverse=inverse,
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, interpret=interpret,
    )
    if pad_n:
        out = out[:N]
        lad = lad[:N]
    return out.reshape(shape), lad.reshape(shape)


def _cubic_fwd(inputs, uw, uh, dl, dr, inverse, tail_bound, min_bin_width,
               min_bin_height, eps, quadratic_threshold, interpret):
    outs = _cubic_pallas_core(inputs, uw, uh, dl, dr, inverse, tail_bound,
                              min_bin_width, min_bin_height, eps,
                              quadratic_threshold, interpret)
    return outs, (inputs, uw, uh, dl, dr)


def _cubic_bwd(inverse, tail_bound, min_bin_width, min_bin_height, eps,
               quadratic_threshold, interpret, residuals, cotangents):
    inputs, uw, uh, dl, dr = residuals
    from nflows_tpu.config import _suspend_pallas_splines
    with _suspend_pallas_splines():
        _, vjp = jax.vjp(
            lambda i, w, h, l, r: _reference(
                i, w, h, l, r, inverse, tail_bound, min_bin_width,
                min_bin_height, eps, quadratic_threshold),
            inputs, uw, uh, dl, dr,
        )
    return vjp(cotangents)


_cubic_pallas_core.defvjp(_cubic_fwd, _cubic_bwd)


def cubic_spline_pallas(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnorm_derivatives_left: jnp.ndarray,
    unnorm_derivatives_right: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = cub_ref.DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = cub_ref.DEFAULT_MIN_BIN_HEIGHT,
    eps: float = cub_ref.DEFAULT_EPS,
    quadratic_threshold: float = cub_ref.DEFAULT_QUADRATIC_THRESHOLD,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused linear-tail monotone-cubic spline. Same contract as
    ops.splines.unconstrained_cubic_spline."""
    return _cubic_pallas_core(
        inputs, unnormalized_widths, unnormalized_heights,
        unnorm_derivatives_left, unnorm_derivatives_right, bool(inverse),
        float(tail_bound), float(min_bin_width), float(min_bin_height),
        float(eps), float(quadratic_threshold), bool(interpret),
    )
