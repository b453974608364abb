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

import jax
import jax.numpy as jnp

from nflows_tpu.ops.pallas import _spline_common as sc
from nflows_tpu.ops.splines import cubic as cub_ref

__all__ = ["cubic_spline_pallas"]


def _kernel(x_ref, w_ref, h_ref, dl_ref, dr_ref, out_ref, lad_ref, *,
            num_bins, inverse, tail_bound, min_bin_width, min_bin_height):
    K = num_bins
    B = tail_bound
    x_orig = x_ref[...]                       # [R, 128]
    inside = (x_orig >= -B) & (x_orig <= B)
    x = (jnp.clip(x_orig, -B, B) + B) / (2.0 * B)      # normalized [0, 1]

    widths = sc.softmax_bins([w_ref[k] for k in range(K)], min_bin_width)
    heights = sc.softmax_bins([h_ref[k] for k in range(K)], min_bin_height)

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

    # bin search + select (sc3 avoids clobbering the _spline_common alias)
    idx = sc.bin_index_ge(x, cumh if inverse else cumw, K)
    sa, sb, sc3, sd, left_w, right_w = sc.select_by_index(
        idx, K, a, b, c, d, cumw[:K], cumw[1:])

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
            fmid = ((sa * mid + sb) * mid + sc3) * mid + sd - x
            go_right = fmid < 0.0
            return (jnp.where(go_right, mid, lo),
                    jnp.where(go_right, hi, mid))

        lo, hi = jax.lax.fori_loop(
            0, 30, halve, (jnp.zeros_like(x), w_bin))
        # one Newton polish (matches ops/splines/cubic.py's root accuracy)
        t_star = 0.5 * (lo + hi)
        deriv = 3.0 * sa * t_star * t_star + 2.0 * sb * t_star + sc3
        f_val = ((sa * t_star + sb) * t_star + sc3) * t_star + sd - x
        shifted = t_star - f_val / deriv
        out01 = shifted + left_w
        lad = -jnp.log(3.0 * sa * shifted * shifted + 2.0 * sb * shifted + sc3)
    else:
        shifted = x - left_w
        out01 = ((sa * shifted + sb) * shifted + sc3) * shifted + sd
        lad = jnp.log(3.0 * sa * shifted * shifted + 2.0 * sb * shifted + sc3)

    out = jnp.clip(out01, 0.0, 1.0) * (2.0 * B) - B
    out_ref[...] = jnp.where(inside, out, x_orig)
    lad_ref[...] = jnp.where(inside, lad, jnp.zeros_like(lad))


def _run_pallas(inputs, params, statics, interpret):
    uw, uh, dl, dr = params
    # eps/quadratic_threshold are Blinn-closed-form knobs; the bisection
    # inverse does not use them (kept in statics for the reference bwd)
    inverse, tail_bound, min_bin_width, min_bin_height, _, _ = statics
    K = uw.shape[-1]
    x, stacks, N, shape = sc.flatten_pad_params(inputs, [uw, uh, dl, dr])
    kernel = functools.partial(
        _kernel, num_bins=K, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
    )
    out, lad = sc.tiled_spline_call(kernel, x, stacks, interpret)
    return out[:N].reshape(shape), lad[:N].reshape(shape)


def _run_reference(inputs, params, statics):
    uw, uh, dl, dr = params
    (inverse, tail_bound, min_bin_width, min_bin_height, eps,
     quadratic_threshold) = statics
    return cub_ref.unconstrained_cubic_spline(
        inputs, uw, uh, dl, dr, inverse=inverse, tails="linear",
        tail_bound=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, eps=eps,
        quadratic_threshold=quadratic_threshold,
    )


_core = sc.make_spline_core(_run_pallas, _run_reference)


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
    return _core(
        inputs, (unnormalized_widths, unnormalized_heights,
                 unnorm_derivatives_left, unnorm_derivatives_right),
        (bool(inverse), float(tail_bound), float(min_bin_width),
         float(min_bin_height), float(eps), float(quadratic_threshold)),
        bool(interpret),
    )
