"""Shared scaffolding for the five standalone fused spline kernels
(linear/quadratic/cubic/rational-quadratic/linear-rational).

Each family keeps only its own math; this module owns the four blocks
they previously copy-pasted (round-2 advisor finding):

1. kernel-side bin helpers — unrolled softmax over K, running CDF /
   cumulative edges with pinned endpoints, sum-of-ge bin search, and the
   where-chain bin select (all on lists of [rows, 128] values, K on the
   leading axis so every op runs at full lane utilization);
2. the host-side pallas_call scaffolding — flatten to lanes, pad to the
   tile, [P, rows, lanes] BlockSpecs, un-pad;
3. the ``custom_vjp`` wiring: the fused kernel is forward-only, the
   backward differentiates the pure-XLA reference implementation
   (rematerialized) under ``config._suspend_pallas_splines`` so training
   gradients are exact and the config dispatch can't recurse
   (regression 0465343);
4. ``pallas_available``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "LANES", "ROWS", "TILE",
    "pallas_available", "softmax_bins", "running_cdf", "edges_from_bins",
    "bin_index_ge", "select_by_index", "tiled_spline_call",
    "flatten_pad_params", "make_spline_core",
]

LANES = 128
ROWS = 64
TILE = LANES * ROWS


def pallas_available() -> bool:
    """Pallas TPU path available on the default backend?"""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# kernel-side bin math (lists of [rows, lanes] values, K unrolled)
# ---------------------------------------------------------------------------

def softmax_bins(vals, min_size=0.0):
    """Stable softmax over the K-list ``vals``; with ``min_size`` applies
    the reference's min-bin mixing (splines/rational_quadratic.py:91-95)."""
    K = len(vals)
    vmax = vals[0]
    for v in vals[1:]:
        vmax = jnp.maximum(vmax, v)
    exps = [jnp.exp(v - vmax) for v in vals]
    total = exps[0]
    for e in exps[1:]:
        total = total + e
    inv_total = 1.0 / total
    if min_size:
        return [min_size + (1.0 - min_size * K) * e * inv_total for e in exps]
    return [e * inv_total for e in exps]


def running_cdf(pdf, x):
    """CDF knots [0, ..., 1] (K+1 entries) with the last pinned exactly."""
    cdf = [jnp.zeros_like(x)]
    run = jnp.zeros_like(x)
    for p in pdf:
        run = run + p
        cdf.append(run)
    cdf[-1] = jnp.ones_like(x)
    return cdf


def edges_from_bins(bins, x, tail_bound):
    """Cumulative edges on [-B, B] (K+1 entries), endpoints pinned."""
    B = tail_bound
    edges = [jnp.full_like(x, -B)]
    run = jnp.zeros_like(x)
    for b in bins:
        run = run + b
        edges.append(2.0 * B * run - B)
    edges[-1] = jnp.full_like(x, B)
    return edges


def bin_index_ge(x, edges, K):
    """Sum-of-ge searchsorted over interior edges (torchutils.py:134-136
    semantics): idx in [0, K-1]."""
    idx = jnp.zeros_like(x, dtype=jnp.int32)
    for k in range(1, K):
        idx = idx + (x >= edges[k]).astype(jnp.int32)
    return idx


def select_by_index(idx, K, *lists):
    """Where-chain select: for each K-list, pick entry ``idx`` per element.
    Returns one selected value per input list."""
    sels = [lst[0] for lst in lists]
    for k in range(1, K):
        m = idx == k
        sels = [jnp.where(m, lst[k], s) for lst, s in zip(lists, sels)]
    return tuple(sels)


# ---------------------------------------------------------------------------
# host-side scaffolding
# ---------------------------------------------------------------------------

def tiled_spline_call(kernel, x_flat, param_stacks, interpret):
    """Run ``kernel(x_ref, *param_refs, out_ref, lad_ref)`` over N elements
    on lanes. ``param_stacks`` is a list of [P_i, N] tensors (P_i = per-
    element parameter count, e.g. K or K+1); N must be a multiple of TILE
    (use :func:`flatten_pad_params` / callers pad). Returns
    (out [N], lad [N])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x_flat.shape[0]
    M = N // LANES
    grid = (M // ROWS,)

    x2 = x_flat.reshape(M, LANES)
    p2s = [p.reshape(p.shape[0], M, LANES) for p in param_stacks]

    elem = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out, lad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[elem] + [
            pl.BlockSpec((p.shape[0], ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
            for p in p2s
        ],
        out_specs=[elem, elem],
        out_shape=[
            jax.ShapeDtypeStruct((M, LANES), x_flat.dtype),
            jax.ShapeDtypeStruct((M, LANES), x_flat.dtype),
        ],
        interpret=interpret,
    )(x2, *p2s)
    return out.reshape(N), lad.reshape(N)


def flatten_pad_params(inputs, param_arrays):
    """Flatten inputs to [N] and each [..., P_i] param array to [P_i, N];
    pad N up to a TILE multiple. Returns (x, stacks, N, shape)."""
    shape = inputs.shape
    N = int(np.prod(shape))
    x = inputs.reshape(N)
    stacks = [p.reshape(N, p.shape[-1]).T for p in param_arrays]
    pad_n = (-N) % TILE
    if pad_n:
        x = jnp.pad(x, (0, pad_n))
        stacks = [jnp.pad(p, ((0, 0), (0, pad_n))) for p in stacks]
    return x, stacks, N, shape


# ---------------------------------------------------------------------------
# custom_vjp wiring (fused forward, XLA-reference backward)
# ---------------------------------------------------------------------------

def make_spline_core(run_pallas, run_reference):
    """Build the family's differentiable core.

    ``run_pallas(inputs, params_tuple, statics_tuple, interpret)`` runs the
    fused kernel; ``run_reference(inputs, params_tuple, statics_tuple)``
    the pure-XLA implementation. ``statics_tuple`` must be hashable. The
    returned core has signature ``core(inputs, params, statics, interpret)``
    and exact XLA-reference gradients w.r.t. inputs and every param array.
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def core(inputs, params, statics, interpret):
        return run_pallas(inputs, params, statics, interpret)

    def fwd(inputs, params, statics, interpret):
        return core(inputs, params, statics, interpret), (inputs, params)

    def bwd(statics, interpret, residuals, cotangents):
        inputs, params = residuals
        from nflows_tpu.config import _suspend_pallas_splines
        with _suspend_pallas_splines():
            _, vjp = jax.vjp(
                lambda i, p: run_reference(i, p, statics), inputs, params)
        return vjp(cotangents)

    core.defvjp(fwd, bwd)
    return core
