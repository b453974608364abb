"""Whole-flow fused Pallas kernel for MAF (masked affine autoregressive)
flows — the ancestral-sampling megakernel.

The AR inverse is the reference's worst bottleneck (D Python-level MADE
passes, nflows/transforms/autoregressive.py:43-52); the XLA path already
compiles it to one while-loop (transforms/autoregressive.py), but at large
sample counts every MADE activation ([N, hidden] x D iterations x L
layers) streams through HBM. This kernel runs the WHOLE chain in one
``pallas_call``:

- samples ride lanes ([D_features, R] state per grid tile);
- every layer's MADE weights are pre-masked (mask folded into the weight
  on the host — a masked dense IS a dense with zeros), pre-transposed,
  flattened to 2-D stacks, DMA'd once into VMEM scratch (the NSF
  megakernel's proven recipe, see nsf_flow_kernel.py);
- per layer the D-step fixed-point inverse runs as a ``fori_loop`` whose
  captured weights are VALUES loaded once per layer — the in-kernel dot
  chain measured 169 TFLOPS (86% MXU) in this form;
- the affine update is full-width [D, R] elementwise (same fixed-point
  iteration as the XLA path, so numerics match it exactly);
- permutations are static row gathers, composed host-side.

Forward (log_prob direction, one MADE pass per layer) is fused too.
Extraction/validation and the user-facing wrapper live in ``maf_fused.py``;
fused TRAINING (forward here + a recompute-in-kernel backward) lives in
``maf_train.py``.

Reference semantics: nflows/transforms/autoregressive.py:64-128 (affine
AR, softplus scale + eps), nflows/transforms/made.py (masked nets).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nflows_tpu.ops.pallas._kernel_common import (
    start_weight_dmas,
    wait_dmas,
)
from nflows_tpu.ops.pallas.nsf_flow_kernel import _rq_spline_TR

__all__ = ["maf_flow_kernel_call", "MAFLayerStatic"]

_EPSILON = 1e-3  # MaskedAffineAutoregressiveTransform._EPSILON


class MAFLayerStatic(NamedTuple):
    perm_rows: Tuple[int, ...]      # forward: x_perm[i] = x[perm_rows[i]]
    inv_perm_rows: Tuple[int, ...]  # inverse of the above
    wrapped: bool = False           # True = InverseTransform(AR) (IAF):
    #                                 the elementwise direction swaps, the
    #                                 permutation placement stays the same


def _dot(w, h):
    return jax.lax.dot_general(
        w, h.astype(w.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _take_rows(x, rows):
    return jnp.concatenate([x[r:r + 1] for r in rows], axis=0)


def _made_forward(x, wi, bi, wbs, bbs, wf, bf, num_blocks,
                  c_init=None, c_blks=None):
    """Residual MADE in transposed layout: [D, R] -> [2D, R].

    Matches nn/made.py:MADE(use_residual_blocks=True, relu): initial
    masked dense (no pre-activation), residual blocks
    (act->lin0->act->lin1, + skip), final masked dense. Masks are already
    folded into the weights. Context enters ADDITIVELY via precomputed
    per-sample vectors (nn/made.py:296-297 initial ``+relu(Wc ctx + bc)``,
    made.py:212-213 per-block ``+Wc ctx + bc`` after linear_0): they are
    constant across the D-step AR fixed point, so the caller computes the
    context GEMMs ONCE per layer and this function only adds [H, R]
    vectors — conditional sampling costs D fixed-point MADE passes but
    only ONE set of context GEMMs.
    """
    h = _dot(wi, x) + bi
    if c_init is not None:
        h = h + c_init
    for j in range(num_blocks):
        t = jnp.maximum(h, 0.0)
        t = _dot(wbs[2 * j], t) + bbs[2 * j]
        if c_blks is not None:
            t = t + c_blks[j]
        t = jnp.maximum(t, 0.0)
        t = _dot(wbs[2 * j + 1], t) + bbs[2 * j + 1]
        h = h + t
    return _dot(wf, h) + bf


def _kernel(x_ref, ctx_ref, wi_hbm, bi_hbm, wb_hbm, bb_hbm, wf_hbm, bf_hbm,
            wci_hbm, bci_hbm, wcb_hbm, bcb_hbm,
            out_ref, lad_ref,
            wi_v, bi_v, wb_v, bb_v, wf_v, bf_v,
            wci_v, bci_v, wcb_v, bcb_v, dma_sems, *,
            layer_static, num_blocks, inverse, D, H, P_rows, transformer,
            spline_kw, has_context, wh_scale=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        pairs = [(wi_hbm, wi_v), (bi_hbm, bi_v), (wb_hbm, wb_v),
                 (bb_hbm, bb_v), (wf_hbm, wf_v), (bf_hbm, bf_v)]
        if has_context:
            pairs += [(wci_hbm, wci_v), (bci_hbm, bci_v),
                      (wcb_hbm, wcb_v), (bcb_hbm, bcb_v)]
        wait_dmas(start_weight_dmas(pairs, dma_sems))

    L = len(layer_static)
    nb = 2 * num_blocks
    x = x_ref[...].astype(jnp.float32)          # [D, R]
    ctx = ctx_ref[...].astype(jnp.float32) if has_context else None
    lad_total = jnp.zeros((1, x.shape[1]), dtype=jnp.float32)

    def layer_weights(l):
        """Load layer l's weights as values (loop-invariant for the
        fixed-point loop below). Static 2-D row-range slices only."""
        wi = wi_v[l * H:(l + 1) * H, :]
        bi = bi_v[l * H:(l + 1) * H, :]
        wbs = [wb_v[(l * nb + j) * H:(l * nb + j + 1) * H, :]
               for j in range(nb)]
        bbs = [bb_v[(l * nb + j) * H:(l * nb + j + 1) * H, :]
               for j in range(nb)]
        wf = wf_v[l * P_rows:(l + 1) * P_rows, :]
        bf = bf_v[l * P_rows:(l + 1) * P_rows, :]
        return wi, bi, wbs, bbs, wf, bf

    def layer_context(l):
        """Precompute layer l's context vectors ONCE: constant across the
        D-step fixed point (and across grid reuse of the weights)."""
        if not has_context:
            return None, None
        wci = wci_v[l * H:(l + 1) * H, :]
        bci = bci_v[l * H:(l + 1) * H, :]
        c_init = jnp.maximum(_dot(wci, ctx) + bci, 0.0)  # made.py:297 relu
        c_blks = []
        for j in range(num_blocks):
            r = (l * num_blocks + j) * H
            c_blks.append(_dot(wcb_v[r:r + H, :], ctx)
                          + bcb_v[r:r + H, :])
        return c_init, c_blks

    def elementwise(x_in, P, inv):
        """Apply the transformer given its param block P [P_rows, R]
        (param-major rows: param j of feature t at row j*D + t)."""
        if transformer == "affine":
            # [0:D] unconstrained scale, [D:2D] shift
            # (reference autoregressive.py:96-101)
            scale = jnp.logaddexp(P[:D], 0.0) + _EPSILON
            log_s = jnp.log(scale)
            if inv:
                return (x_in - P[D:]) / scale, -log_s
            return scale * x_in + P[D:], log_s
        # RQ spline (NSF-AR, reference autoregressive.py:404-495); the
        # 1/sqrt(hidden) width/height rescale is folded into the final
        # weights at extraction
        return _rq_spline_TR(x_in, P, T=D, inverse=inv, **spline_kw)

    def conditioner(x_in, weights, c_init, c_blks):
        P = _made_forward(x_in, *weights, num_blocks,
                          c_init=c_init, c_blks=c_blks)
        if wh_scale is not None:
            # unfolded 1/sqrt(hidden) width/height rescale (training keeps
            # the final-layer weights pure permutations of the model's)
            KD2 = 2 * spline_kw["num_bins"] * D
            P = jnp.concatenate([P[:KD2] * wh_scale, P[KD2:]], axis=0)
        return P

    def ar_forward(x_in, weights, c_init, c_blks):
        """One MADE pass + elementwise forward."""
        P = conditioner(x_in, weights, c_init, c_blks)
        return elementwise(x_in, P, inv=False)

    def ar_inverse(z, weights, c_init, c_blks):
        """D-step fixed point (same iteration as the XLA path,
        transforms/autoregressive.py:53-62)."""
        def body(_, xi, z=z, weights=weights, c_init=c_init,
                 c_blks=c_blks):
            P = conditioner(xi, weights, c_init, c_blks)
            return elementwise(z, P, inv=True)[0]

        xi = jax.lax.fori_loop(0, D, body, jnp.zeros_like(z))
        P = conditioner(xi, weights, c_init, c_blks)
        _, lad = elementwise(z, P, inv=True)
        return xi, lad

    order = range(L - 1, -1, -1) if inverse else range(L)
    for l in order:
        ls = layer_static[l]
        weights = layer_weights(l)
        c_init, c_blks = layer_context(l)
        # a wrapped (InverseTransform'd, IAF-style) layer swaps WHICH
        # elementwise direction runs in which branch; the permutation's
        # placement (before the AR op going forward, after coming back)
        # is unchanged
        if inverse:
            fn = ar_forward if ls.wrapped else ar_inverse
            y, lad = fn(x, weights, c_init, c_blks)
            x = _take_rows(y, ls.inv_perm_rows)
        else:
            xp = _take_rows(x, ls.perm_rows)
            fn = ar_inverse if ls.wrapped else ar_forward
            x, lad = fn(xp, weights, c_init, c_blks)
        lad_total = lad_total + jnp.sum(lad, axis=0, keepdims=True)

    out_ref[...] = x
    lad_ref[...] = lad_total


def maf_flow_kernel_call(
    x_t: jnp.ndarray,               # [D, N] fp32, N multiple of lanes
    wi: jnp.ndarray,                # [L*H, D]  (pre-masked, transposed)
    bi: jnp.ndarray,                # [L*H, 1] fp32
    wb: jnp.ndarray,                # [L*2nb*H, H]
    bb: jnp.ndarray,                # [L*2nb*H, 1]
    wf: jnp.ndarray,                # [L*P_rows, H] (param-major row order)
    bf: jnp.ndarray,                # [L*P_rows, 1]
    layer_static,
    *,
    inverse: bool,
    num_blocks: int,
    transformer: str = "affine",    # "affine" (MAF) | "rq" (NSF-AR)
    spline_kw=None,                 # for "rq": num_bins, tail_bound, mins
    lanes: int = 2048,
    interpret: bool = False,
    ctx_t: jnp.ndarray = None,      # [C, N] per-sample context (optional)
    wci: jnp.ndarray = None,        # [L*H, C] initial context projections
    bci: jnp.ndarray = None,        # [L*H, 1] fp32
    wcb: jnp.ndarray = None,        # [L*num_blocks*H, C] block projections
    bcb: jnp.ndarray = None,        # [L*num_blocks*H, 1] fp32
    wh_scale: float = None,         # in-kernel RQ width/height rescale
                                    # (training's unfolded-weight form)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, N = x_t.shape
    L = len(layer_static)
    H = wi.shape[0] // L
    P_rows = wf.shape[0] // L
    if N % lanes:
        raise ValueError(f"N={N} must be a multiple of lanes={lanes}")
    if transformer not in ("affine", "rq"):
        raise ValueError(f"unknown transformer {transformer!r}")
    if transformer == "rq" and not spline_kw:
        raise ValueError("spline_kw is required for transformer='rq'")
    grid = (N // lanes,)

    has_context = ctx_t is not None
    if has_context:
        if wci is None or bci is None or wcb is None or bcb is None:
            raise ValueError("ctx_t requires wci/bci/wcb/bcb")
        if ctx_t.shape[1] != N:
            raise ValueError(
                f"ctx_t has {ctx_t.shape[1]} samples but x_t has {N}")
        C = ctx_t.shape[0]
    else:
        # 1-row dummies keep the pallas_call signature static; the kernel
        # never touches them (has_context=False skips their DMA and use)
        C = 1
        ctx_t = jnp.zeros((1, N), dtype=jnp.float32)
        wci = jnp.zeros((1, 1), dtype=wi.dtype)
        bci = jnp.zeros((1, 1), dtype=jnp.float32)
        wcb = jnp.zeros((1, 1), dtype=wi.dtype)
        bcb = jnp.zeros((1, 1), dtype=jnp.float32)

    if wh_scale is not None and transformer != "rq":
        raise ValueError("wh_scale is the RQ softmax rescale; invalid for "
                         f"transformer={transformer!r}")
    kernel = functools.partial(
        _kernel, layer_static=tuple(layer_static), num_blocks=num_blocks,
        inverse=inverse, D=D, H=H, P_rows=P_rows, transformer=transformer,
        spline_kw=dict(spline_kw or {}), has_context=has_context,
        wh_scale=wh_scale,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)

    out, lad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            hbm, hbm, hbm, hbm, hbm, hbm,
            hbm, hbm, hbm, hbm,
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
            pltpu.VMEM(wi.shape, wi.dtype),
            pltpu.VMEM(bi.shape, bi.dtype),
            pltpu.VMEM(wb.shape, wb.dtype),
            pltpu.VMEM(bb.shape, bb.dtype),
            pltpu.VMEM(wf.shape, wf.dtype),
            pltpu.VMEM(bf.shape, bf.dtype),
            pltpu.VMEM(wci.shape, wci.dtype),
            pltpu.VMEM(bci.shape, bci.dtype),
            pltpu.VMEM(wcb.shape, wcb.dtype),
            pltpu.VMEM(bcb.shape, bcb.dtype),
            pltpu.SemaphoreType.DMA((10,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_t, ctx_t, wi, bi, wb, bb, wf, bf, wci, bci, wcb, bcb)
    return out, lad
