"""Fused TRAINING for tabular NSF coupling flows: forward and backward
passes each run as one Pallas megakernel.

Round-2's whole-flow kernel (nsf_flow_kernel.py) was inference-only; the
round-2 VERDICT asked for a backward so training — the dominant workload —
gets the fused wins. This module supplies it:

- ``nsf_train_apply`` is a ``jax.custom_vjp`` whose forward is the
  existing fused chain and whose backward is a SECOND Pallas kernel that
  recomputes per-layer inputs in VMEM (activations never touch HBM — the
  in-kernel analogue of ``jax.checkpoint``) and differentiates each layer
  with ``jax.vjp`` applied to the *same traced layer function the forward
  uses* — no hand-derived spline adjoints to get wrong. Weight gradients
  accumulate across grid tiles in VMEM-resident output blocks (TPU grids
  are sequential, so `+=` into a constant-index output block is exact).
- ``FusedNSFTrainer`` owns the kernel-layout weights as the canonical
  trainable pytree. Extraction does NOT fold the softmax 1/sqrt(hidden)
  rescale (the kernel applies it via ``wh_scale``), so every kernel-layout
  parameter is a pure transpose/permutation of the model's — an
  elementwise optimizer (Adam) follows the identical trajectory, and
  ``to_flow()`` maps the trained weights back into a standard
  ``NeuralSplineFlow`` for serving/eval.

Conditional flows train fused too (round 3): the per-sample context rides
the lanes in both kernels — the forward adds the context-GLU GEMMs
(nsf_flow_kernel.py) and the backward produces gradients for the context
weights AND for the context itself, so an XLA embedding net composed
outside the kernel trains through ``nsf_train_vjp_call(has_context=True)``.

All seven coupling families train fused (round 3): rq/lrs/linear/
quadratic/cubic splines and affine/additive couplings. The per-family
softmax 1/sqrt(hidden) rescale prefix differs — rq/lrs/cubic rescale
widths+heights (the first 2KT K-major param rows), quadratic rescales ALL
its params (its M=2K-1 < 2K rows are fully covered by the clamped 2KT
slice), linear/affine/additive rescale nothing (``wh_scale=None``) —
matching extraction's ``n_scaled`` table (nsf_fused.py) so
fold_wh_scale=False weights stay elementwise-optimizer-equivalent in
every family (tests/ops/test_nsf_train_families.py).

Reference math being differentiated:
nflows/transforms/splines/rational_quadratic.py:132-181 (forward branch)
through nflows/transforms/coupling.py:502-582; the conditioner is
nflows/nn/nets/resnet.py:55-100 (context GLU: resnet.py:51).

Gradient equality vs the autodiff'd XLA chain is pinned in
tests/ops/test_nsf_train.py (interpret mode); TPU throughput in
benchmarks/bench_fused_train.py.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.pallas._kernel_common import (
    start_weight_dmas,
    wait_dmas,
)
from nflows_tpu.ops.pallas._trainer_common import FusedTrainerBase
from nflows_tpu.ops.pallas.nsf_flow_kernel import (
    _with_mosaic_moves,
    _SPLINES_TR,
    _take_rows,
    nsf_flow_kernel_call,
)

__all__ = ["FusedNSFTrainer", "nsf_train_vjp_call", "nsf_loss_grad_call"]


def _dot_f32(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _conditioner_vals(identity, ws, num_blocks, ctx=None):
    """ResidualNet forward on weight VALUES (differentiable w.r.t. them).
    ``ws`` is the flat per-layer tuple (w0, b0, wb_0..wb_{2nb-1},
    bb_0..bb_{2nb-1}, wf, bf[, wc0, wcb_0..wcb_{nb/2-1},
    bcb_0..bcb_{nb/2-1}]), every matrix pre-transposed for the
    samples-on-lanes layout; the context tail is present iff ``ctx`` is
    (matching the inference kernel's context GLU, nsf_flow_kernel.py)."""
    w0, b0 = ws[0], ws[1]
    nb = 2 * num_blocks
    wbs = ws[2:2 + nb]
    bbs = ws[2 + nb:2 + 2 * nb]
    base = 2 + 2 * nb
    wf, bf = ws[base], ws[base + 1]
    if ctx is not None:
        wc0 = ws[base + 2]
        wcbs = ws[base + 3:base + 3 + num_blocks]
        bcbs = ws[base + 3 + num_blocks:base + 3 + 2 * num_blocks]
    h = _dot_f32(w0, identity) + b0
    if ctx is not None:
        h = h + _dot_f32(wc0, ctx)
    for j in range(num_blocks):
        t = jnp.maximum(h, 0.0)
        t = _dot_f32(wbs[2 * j], t) + bbs[2 * j]
        t = jnp.maximum(t, 0.0)
        t = _dot_f32(wbs[2 * j + 1], t) + bbs[2 * j + 1]
        if ctx is not None:
            gate = _dot_f32(wcbs[j], ctx) + bcbs[j]
            t = t * (1.0 / (1.0 + jnp.exp(-gate)))
        h = h + t
    return _dot_f32(wf, h) + bf


def _make_layer_fn(li, spline, num_bins, num_blocks, wh_scale, spline_kw,
                   has_ctx=False):
    """The differentiable forward of ONE [permutation, coupling] layer:
    (x [D, R][, ctx [C, R]], *weights) -> (y [D, R], lad_sum [1, R])."""
    T = len(li.tr_idx)
    KT2 = 2 * num_bins * T

    def body(x_full, ctx, ws):
        identity = _take_rows(x_full, li.id_rows)
        transform = _take_rows(x_full, li.tr_rows)
        P = _conditioner_vals(identity, ws, num_blocks, ctx=ctx)
        if wh_scale is not None:
            # first 2KT K-major rows are widths+heights (for quadratic,
            # whose M=2K-1 < 2K, the clamped slice covers ALL its params —
            # matching the reference's full-param softmax rescale)
            P = jnp.concatenate([P[:KT2] * wh_scale, P[KT2:]], axis=0)
        out, lad = _SPLINES_TR[spline](
            transform, P, num_bins=num_bins, T=T, inverse=False, **spline_kw)
        y = _take_rows(jnp.concatenate([identity, out], axis=0), li.merge_fwd)
        return y, jnp.sum(lad, axis=0, keepdims=True)

    if has_ctx:
        def layer_fn(x_full, ctx, *ws):
            return body(x_full, ctx, ws)
    else:
        def layer_fn(x_full, *ws):
            return body(x_full, None, ws)

    return layer_fn


def _slice_layer_weights(l, w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
                         num_blocks, H, TM,
                         wc0_v=None, wcb_v=None, bcb_v=None):
    """Read layer l's weight VALUES out of the flattened VMEM scratch."""
    nb = 2 * num_blocks

    def rows(ref, i, r):
        return ref[i * r:(i + 1) * r, :]

    ws = [rows(w0_v, l, H), rows(b0_v, l, H)]
    ws += [rows(wb_v, l * nb + j, H) for j in range(nb)]
    ws += [rows(bb_v, l * nb + j, H) for j in range(nb)]
    ws += [rows(wf_v, l, TM), rows(bf_v, l, TM)]
    if wc0_v is not None:
        ws += [rows(wc0_v, l, H)]
        ws += [rows(wcb_v, l * num_blocks + j, H) for j in range(num_blocks)]
        ws += [rows(bcb_v, l * num_blocks + j, H) for j in range(num_blocks)]
    return tuple(ws)


@_with_mosaic_moves
def _bwd_kernel(x_ref, ctx_ref, gy_ref, glad_ref,
                w0_hbm, b0_hbm, wb_hbm, bb_hbm, wf_hbm, bf_hbm,
                wc0_hbm, wcb_hbm, bcb_hbm,
                gx_ref, gctx_ref, gw0_ref, gb0_ref, gwb_ref, gbb_ref,
                gwf_ref, gbf_ref, gwc0_ref, gwcb_ref, gbcb_ref,
                w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
                wc0_v, wcb_v, bcb_v, dma_sems, *,
                layer_indices, num_bins, num_blocks, H, TM, spline,
                spline_kw, wh_scale, has_context):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @pl.when(pl.program_id(0) == 0)
    def _init():
        pairs = [(w0_hbm, w0_v), (b0_hbm, b0_v), (wb_hbm, wb_v),
                 (bb_hbm, bb_v), (wf_hbm, wf_v), (bf_hbm, bf_v)]
        if has_context:
            pairs += [(wc0_hbm, wc0_v), (wcb_hbm, wcb_v), (bcb_hbm, bcb_v)]
        dmas = start_weight_dmas(pairs, dma_sems)
        # zero the cross-tile gradient accumulators while the DMAs fly
        for ref in (gw0_ref, gb0_ref, gwb_ref, gbb_ref, gwf_ref, gbf_ref,
                    gwc0_ref, gwcb_ref, gbcb_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        wait_dmas(dmas)

    L = len(layer_indices)
    layer_fns = [
        _make_layer_fn(layer_indices[l], spline, num_bins, num_blocks,
                       wh_scale, spline_kw, has_ctx=has_context)
        for l in range(L)
    ]
    cvs = ((wc0_v, wcb_v, bcb_v) if has_context else (None, None, None))
    all_ws = [
        _slice_layer_weights(l, w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
                             num_blocks, H, TM,
                             wc0_v=cvs[0], wcb_v=cvs[1], bcb_v=cvs[2])
        for l in range(L)
    ]

    # forward recompute, keeping only the per-layer INPUTS ([D, R] each —
    # the cheap residuals; conditioner activations are re-derived inside
    # each layer's vjp)
    x = x_ref[...].astype(jnp.float32)
    ctx = ctx_ref[...].astype(jnp.float32) if has_context else None
    xs = []
    for l in range(L):
        xs.append(x)
        if has_context:
            x, _ = layer_fns[l](x, ctx, *all_ws[l])
        else:
            x, _ = layer_fns[l](x, *all_ws[l])

    # backward sweep: vjp of each traced layer, accumulating weight grads
    # (and, with context, the per-sample context grad across layers)
    gx = gy_ref[...].astype(jnp.float32)
    glad = glad_ref[...].astype(jnp.float32)
    nb = 2 * num_blocks
    gctx = None
    for l in range(L - 1, -1, -1):
        if has_context:
            _, vjp = jax.vjp(layer_fns[l], xs[l], ctx, *all_ws[l])
            gx, gctx_l, *gws = vjp((gx, glad))
            gctx = gctx_l if gctx is None else gctx + gctx_l
        else:
            _, vjp = jax.vjp(layer_fns[l], xs[l], *all_ws[l])
            gx, *gws = vjp((gx, glad))
        gw0_ref[l * H:(l + 1) * H, :] += gws[0]
        gb0_ref[l * H:(l + 1) * H, :] += gws[1]
        for j in range(nb):
            r = (l * nb + j) * H
            gwb_ref[r:r + H, :] += gws[2 + j]
            gbb_ref[r:r + H, :] += gws[2 + nb + j]
        base = 2 + 2 * nb
        gwf_ref[l * TM:(l + 1) * TM, :] += gws[base]
        gbf_ref[l * TM:(l + 1) * TM, :] += gws[base + 1]
        if has_context:
            gwc0_ref[l * H:(l + 1) * H, :] += gws[base + 2]
            for j in range(num_blocks):
                r = (l * num_blocks + j) * H
                gwcb_ref[r:r + H, :] += gws[base + 3 + j]
                gbcb_ref[r:r + H, :] += gws[base + 3 + num_blocks + j]

    gx_ref[...] = gx
    gctx_ref[...] = (gctx if has_context
                     else jnp.zeros(gctx_ref.shape, gctx_ref.dtype))


def _family_spline_config(static):
    """Per-family kernel config shared by the custom_vjp and one-kernel
    builders: (spline_kw, scaled, kernel_spline_name, packed).

    rq/lrs/cubic rescale widths+heights by 1/sqrt(hidden); quadratic
    rescales ALL its params (covered by the clamped 2KT slice); linear and
    affine/additive rescale nothing (extraction folds nothing either way,
    so fold_wh_scale=False weights are already the model's own). The
    packed-select choice resolves ONCE at build so every kernel of a
    trainer runs the same spline form."""
    from nflows_tpu import config

    family = static["spline"]
    if family in ("affine", "additive"):
        # scale_act='none' is the additive case (extraction sets it)
        spline_kw = dict(scale_act=static["scale_act"])
    elif family == "linear":
        spline_kw = dict(tail_bound=static["tail_bound"])
    elif family in ("quadratic", "cubic"):
        spline_kw = dict(
            tail_bound=static["tail_bound"],
            min_bin_width=static["min_bin_width"],
            min_bin_height=static["min_bin_height"],
        )
    else:
        spline_kw = dict(
            tail_bound=static["tail_bound"],
            min_bin_width=static["min_bin_width"],
            min_bin_height=static["min_bin_height"],
            min_derivative=static["min_derivative"],
        )
        if family == "lrs":
            spline_kw["min_lambda"] = static["min_lambda"]
    scaled = family in ("rq", "lrs", "cubic", "quadratic")
    from nflows_tpu.ops.pallas.nsf_flow_kernel import _packed_spline_name
    style = config._packed_spline_style("training")
    kernel_spline = _packed_spline_name(family, style)
    # 4th element is the resolved STYLE (False/'mm'/'roll'), forwarded
    # verbatim to nsf_flow_kernel_call so the split custom_vjp path's
    # forward kernel runs the SAME form as the backward
    return (spline_kw, scaled, kernel_spline,
            style if kernel_spline != family else False)


@_with_mosaic_moves
def _loss_grad_kernel(x_ref, ctx_ref,
                      w0_hbm, b0_hbm, wb_hbm, bb_hbm, wf_hbm, bf_hbm,
                      wc0_hbm, wcb_hbm, bcb_hbm,
                      lp_ref, gw0_ref, gb0_ref, gwb_ref, gbb_ref,
                      gwf_ref, gbf_ref, gwc0_ref, gwcb_ref, gbcb_ref,
                      w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
                      wc0_v, wcb_v, bcb_v, dma_sems, *,
                      layer_indices, num_bins, num_blocks, H, TM, spline,
                      spline_kw, wh_scale, has_context, inv_n, log_z):
    """ONE kernel = loss + every weight gradient.

    The split design (forward kernel + recompute-in-kernel backward) costs
    5 forward-equivalents of FLOPs per step: fwd kernel (1) + backward's
    chain recompute (1) + each layer vjp's forward re-run (1) + backprop
    (2). Here the chain pass IS the vjp pass (residuals stay in VMEM — the
    measured footprint of the split kernel showed they coexist anyway),
    and the NLL loss closes over the outputs in-kernel, so the whole train
    gradient is 3 forward-equivalents — the same FLOPs XLA's
    stored-activation autodiff does, with zero activation HBM traffic and
    a single launch. Cotangents of ``loss = -mean(lp)`` are analytic:
    d/dy = y/N, d/dlad = -1/N.
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        pairs = [(w0_hbm, w0_v), (b0_hbm, b0_v), (wb_hbm, wb_v),
                 (bb_hbm, bb_v), (wf_hbm, wf_v), (bf_hbm, bf_v)]
        if has_context:
            pairs += [(wc0_hbm, wc0_v), (wcb_hbm, wcb_v), (bcb_hbm, bcb_v)]
        dmas = start_weight_dmas(pairs, dma_sems)
        for ref in (gw0_ref, gb0_ref, gwb_ref, gbb_ref, gwf_ref, gbf_ref,
                    gwc0_ref, gwcb_ref, gbcb_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        wait_dmas(dmas)

    L = len(layer_indices)
    layer_fns = [
        _make_layer_fn(layer_indices[l], spline, num_bins, num_blocks,
                       wh_scale, spline_kw, has_ctx=has_context)
        for l in range(L)
    ]
    cvs = ((wc0_v, wcb_v, bcb_v) if has_context else (None, None, None))
    all_ws = [
        _slice_layer_weights(l, w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
                             num_blocks, H, TM,
                             wc0_v=cvs[0], wcb_v=cvs[1], bcb_v=cvs[2])
        for l in range(L)
    ]

    # single chain pass: the forward AND the residual-storing vjp pass
    x = x_ref[...].astype(jnp.float32)
    ctx = ctx_ref[...].astype(jnp.float32) if has_context else None
    lad = jnp.zeros((1, x.shape[1]), jnp.float32)
    vjps = []
    for l in range(L):
        if has_context:
            (x, lad_l), vjp = jax.vjp(layer_fns[l], x, ctx, *all_ws[l])
        else:
            (x, lad_l), vjp = jax.vjp(layer_fns[l], x, *all_ws[l])
        vjps.append(vjp)
        lad = lad + lad_l

    # per-sample log prob under the StandardNormal base
    lp_ref[...] = (-0.5 * jnp.sum(x * x, axis=0, keepdims=True)
                   - log_z + lad)

    # analytic cotangents of loss = -(1/N) * sum(lp)
    gx = x * inv_n
    glad = jnp.full((1, x.shape[1]), -inv_n, jnp.float32)
    nb = 2 * num_blocks
    for l in range(L - 1, -1, -1):
        if has_context:
            gx, _, *gws = vjps[l]((gx, glad))
        else:
            gx, *gws = vjps[l]((gx, glad))
        gw0_ref[l * H:(l + 1) * H, :] += gws[0]
        gb0_ref[l * H:(l + 1) * H, :] += gws[1]
        for j in range(nb):
            r = (l * nb + j) * H
            gwb_ref[r:r + H, :] += gws[2 + j]
            gbb_ref[r:r + H, :] += gws[2 + nb + j]
        base = 2 + 2 * nb
        gwf_ref[l * TM:(l + 1) * TM, :] += gws[base]
        gbf_ref[l * TM:(l + 1) * TM, :] += gws[base + 1]
        if has_context:
            gwc0_ref[l * H:(l + 1) * H, :] += gws[base + 2]
            for j in range(num_blocks):
                r = (l * num_blocks + j) * H
                gwcb_ref[r:r + H, :] += gws[base + 3 + j]
                gbcb_ref[r:r + H, :] += gws[base + 3 + num_blocks + j]


def _loss_grad_pallas(x_t, w0, b0, wb, bb, wf, bf, *,
                      layer_indices, num_bins, num_blocks, spline,
                      spline_kw, wh_scale, lanes, interpret,
                      ctx_t=None, wc0=None, wcb=None, bcb=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, N = x_t.shape
    L, H, Tid = w0.shape
    TM = wf.shape[1]
    grid = (N // lanes,)

    w0f = w0.reshape(L * H, -1)
    b0f = b0.reshape(L * H, 1)
    wbf = wb.reshape(-1, H)
    bbf = bb.reshape(-1, 1)
    wff = wf.reshape(L * TM, H)
    bff = bf.reshape(L * TM, 1)

    has_context = ctx_t is not None
    if has_context:
        C = ctx_t.shape[0]
        ctx_shapes = (wc0.shape, wcb.shape, bcb.shape)
        wc0f = wc0.reshape(L * H, C)
        wcbf = wcb.reshape(-1, C)
        bcbf = bcb.reshape(-1, 1)
    else:
        C = 1
        ctx_t = jnp.zeros((1, N), dtype=jnp.float32)
        wc0f = jnp.zeros((1, 1), dtype=jnp.float32)
        wcbf = jnp.zeros((1, 1), dtype=jnp.float32)
        bcbf = jnp.zeros((1, 1), dtype=jnp.float32)

    kernel = functools.partial(
        _loss_grad_kernel,
        layer_indices=tuple(layer_indices),
        num_bins=num_bins, num_blocks=num_blocks, H=H, TM=TM,
        spline=spline, spline_kw=spline_kw, wh_scale=wh_scale,
        has_context=has_context,
        inv_n=1.0 / N,
        log_z=0.5 * D * math.log(2.0 * math.pi),
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tile = lambda shape: pl.BlockSpec(  # noqa: E731
        (shape, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    acc = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(D), tile(C),
                  hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm],
        out_specs=[
            tile(1),
            acc(*w0f.shape), acc(*b0f.shape), acc(*wbf.shape),
            acc(*bbf.shape), acc(*wff.shape), acc(*bff.shape),
            acc(*wc0f.shape), acc(*wcbf.shape), acc(*bcbf.shape),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct(w0f.shape, jnp.float32),
            jax.ShapeDtypeStruct(b0f.shape, jnp.float32),
            jax.ShapeDtypeStruct(wbf.shape, jnp.float32),
            jax.ShapeDtypeStruct(bbf.shape, jnp.float32),
            jax.ShapeDtypeStruct(wff.shape, jnp.float32),
            jax.ShapeDtypeStruct(bff.shape, jnp.float32),
            jax.ShapeDtypeStruct(wc0f.shape, jnp.float32),
            jax.ShapeDtypeStruct(wcbf.shape, jnp.float32),
            jax.ShapeDtypeStruct(bcbf.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(w0f.shape, jnp.float32),
            pltpu.VMEM(b0f.shape, jnp.float32),
            pltpu.VMEM(wbf.shape, jnp.float32),
            pltpu.VMEM(bbf.shape, jnp.float32),
            pltpu.VMEM(wff.shape, jnp.float32),
            pltpu.VMEM(bff.shape, jnp.float32),
            pltpu.VMEM(wc0f.shape, jnp.float32),
            pltpu.VMEM(wcbf.shape, jnp.float32),
            pltpu.VMEM(bcbf.shape, jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_t, ctx_t, w0f, b0f, wbf, bbf, wff, bff, wc0f, wcbf, bcbf)
    lp, gw0, gb0, gwb, gbb, gwf, gbf, gwc0, gwcb, gbcb = outs
    gweights = dict(
        w0=gw0.reshape(w0.shape), b0=gb0.reshape(b0.shape),
        wb=gwb.reshape(wb.shape), bb=gbb.reshape(bb.shape),
        wf=gwf.reshape(wf.shape), bf=gbf.reshape(bf.shape))
    if has_context:
        gweights.update(
            wc0=gwc0.reshape(ctx_shapes[0]),
            wcb=gwcb.reshape(ctx_shapes[1]),
            bcb=gbcb.reshape(ctx_shapes[2]))
    return lp, gweights


def nsf_loss_grad_call(indices, static, lanes, interpret,
                       has_context=False):
    """Build the ONE-kernel NLL ``loss_and_grad(weights, x_t[, ctx_t]) ->
    (loss, grads)`` (see ``_loss_grad_kernel``). Gradients and loss equal
    the custom_vjp path / XLA autodiff exactly (same traced layer math);
    pinned by tests/ops/test_nsf_loss_grad.py."""
    spline_kw, scaled, bwd_spline, _ = _family_spline_config(static)
    common = dict(
        layer_indices=tuple(indices),
        num_bins=static.get("num_bins", 0),
        num_blocks=static["num_blocks"],
        spline=bwd_spline,
        spline_kw=spline_kw,
        lanes=lanes,
        interpret=interpret,
    )

    def loss_and_grad(weights, x_t, ctx_t=None):
        H = weights["w0"].shape[1]
        ctx_kw = {}
        if has_context:
            ctx_kw = dict(ctx_t=ctx_t, wc0=weights["wc0"],
                          wcb=weights["wcb"], bcb=weights["bcb"])
        lp, gweights = _loss_grad_pallas(
            x_t, weights["w0"], weights["b0"], weights["wb"],
            weights["bb"], weights["wf"], weights["bf"],
            wh_scale=(1.0 / math.sqrt(H)) if scaled else None,
            **common, **ctx_kw)
        return -jnp.mean(lp), gweights

    return loss_and_grad


def _bwd_call(x_t, gy_t, glad, w0, b0, wb, bb, wf, bf, *,
              layer_indices, num_bins, num_blocks, spline, spline_kw,
              wh_scale, lanes, interpret,
              ctx_t=None, wc0=None, wcb=None, bcb=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, N = x_t.shape
    L, H, Tid = w0.shape
    TM = wf.shape[1]
    grid = (N // lanes,)

    w0f = w0.reshape(L * H, -1)
    b0f = b0.reshape(L * H, 1)
    wbf = wb.reshape(-1, H)
    bbf = bb.reshape(-1, 1)
    wff = wf.reshape(L * TM, H)
    bff = bf.reshape(L * TM, 1)

    has_context = ctx_t is not None
    if has_context:
        C = ctx_t.shape[0]
        ctx_shapes = (wc0.shape, wcb.shape, bcb.shape)
        wc0f = wc0.reshape(L * H, C)
        wcbf = wcb.reshape(-1, C)
        bcbf = bcb.reshape(-1, 1)
    else:
        # 1-row dummies keep the pallas_call signature static (the kernel
        # skips their DMA/use when has_context=False)
        C = 1
        ctx_t = jnp.zeros((1, N), dtype=jnp.float32)
        wc0f = jnp.zeros((1, 1), dtype=jnp.float32)
        wcbf = jnp.zeros((1, 1), dtype=jnp.float32)
        bcbf = jnp.zeros((1, 1), dtype=jnp.float32)

    kernel = functools.partial(
        _bwd_kernel,
        layer_indices=tuple(layer_indices),
        num_bins=num_bins, num_blocks=num_blocks, H=H, TM=TM,
        spline=spline, spline_kw=spline_kw, wh_scale=wh_scale,
        has_context=has_context,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tile = lambda shape: pl.BlockSpec(  # noqa: E731
        (shape, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    acc = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(D), tile(C), tile(D), tile(1),
                  hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm],
        out_specs=[
            tile(D), tile(C),
            acc(*w0f.shape), acc(*b0f.shape), acc(*wbf.shape),
            acc(*bbf.shape), acc(*wff.shape), acc(*bff.shape),
            acc(*wc0f.shape), acc(*wcbf.shape), acc(*bcbf.shape),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, N), jnp.float32),
            jax.ShapeDtypeStruct((C, N), jnp.float32),
            jax.ShapeDtypeStruct(w0f.shape, jnp.float32),
            jax.ShapeDtypeStruct(b0f.shape, jnp.float32),
            jax.ShapeDtypeStruct(wbf.shape, jnp.float32),
            jax.ShapeDtypeStruct(bbf.shape, jnp.float32),
            jax.ShapeDtypeStruct(wff.shape, jnp.float32),
            jax.ShapeDtypeStruct(bff.shape, jnp.float32),
            jax.ShapeDtypeStruct(wc0f.shape, jnp.float32),
            jax.ShapeDtypeStruct(wcbf.shape, jnp.float32),
            jax.ShapeDtypeStruct(bcbf.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(w0f.shape, jnp.float32),
            pltpu.VMEM(b0f.shape, jnp.float32),
            pltpu.VMEM(wbf.shape, jnp.float32),
            pltpu.VMEM(bbf.shape, jnp.float32),
            pltpu.VMEM(wff.shape, jnp.float32),
            pltpu.VMEM(bff.shape, jnp.float32),
            pltpu.VMEM(wc0f.shape, jnp.float32),
            pltpu.VMEM(wcbf.shape, jnp.float32),
            pltpu.VMEM(bcbf.shape, jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_t, ctx_t, gy_t, glad, w0f, b0f, wbf, bbf, wff, bff,
      wc0f, wcbf, bcbf)
    gx, gctx, gw0, gb0, gwb, gbb, gwf, gbf, gwc0, gwcb, gbcb = outs
    core = (gx,
            gw0.reshape(w0.shape), gb0.reshape(b0.shape),
            gwb.reshape(wb.shape), gbb.reshape(bb.shape),
            gwf.reshape(wf.shape), gbf.reshape(bf.shape))
    if not has_context:
        return core
    return core + (gctx,
                   gwc0.reshape(ctx_shapes[0]),
                   gwcb.reshape(ctx_shapes[1]),
                   gbcb.reshape(ctx_shapes[2]))


def nsf_train_vjp_call(indices, static, lanes, interpret,
                       has_context=False):
    """Build the custom_vjp'd fused forward for training.

    Returns ``apply(weights_dict, x_t) -> (y_t [D, N], lad [1, N])`` whose
    backward runs the recompute-in-kernel Pallas pass. ``weights_dict``
    holds fp32 kernel-layout stacks (w0/b0/wb/bb/wf/bf) extracted with
    ``fold_wh_scale=False``.

    With ``has_context=True`` the signature is
    ``apply(weights, x_t, ctx_t)`` where ``ctx_t`` is the [C, N]
    per-sample (already-embedded) context and ``weights`` additionally
    holds the context stacks (wc0/wcb/bcb). The backward produces
    gradients for the context weights AND for ``ctx_t`` itself, so an
    XLA embedding net composed outside the kernel trains through it.
    """
    family = static["spline"]
    spline_kw, scaled, bwd_spline, packed = _family_spline_config(static)
    common = dict(
        layer_indices=tuple(indices),
        num_bins=static.get("num_bins", 0),
        num_blocks=static["num_blocks"],
        spline=bwd_spline,
        spline_kw=spline_kw,
        lanes=lanes,
        interpret=interpret,
    )

    def _forward(weights, x_t, ctx_t):
        H = weights["w0"].shape[1]
        ctx_kw = {}
        if has_context:
            ctx_kw = dict(ctx_t=ctx_t, wc0=weights["wc0"],
                          wcb=weights["wcb"], bcb=weights["bcb"])
        return nsf_flow_kernel_call(
            x_t, weights["w0"], weights["b0"], weights["wb"], weights["bb"],
            weights["wf"], weights["bf"], tuple(indices), inverse=False,
            num_bins=static.get("num_bins", 0),
            num_blocks=static["num_blocks"],
            tail_bound=static.get("tail_bound"),
            min_bin_width=static.get("min_bin_width"),
            min_bin_height=static.get("min_bin_height"),
            min_derivative=static.get("min_derivative"),
            spline=family, min_lambda=static.get("min_lambda"),
            scale_act=static.get("scale_act"),
            wh_scale=(1.0 / math.sqrt(H)) if scaled else None,
            lanes=lanes, interpret=interpret,
            packed_select=packed, **ctx_kw,
        )

    def _backward(weights, x_t, ctx_t, gy_t, glad):
        H = weights["w0"].shape[1]
        ctx_kw = {}
        if has_context:
            ctx_kw = dict(ctx_t=ctx_t, wc0=weights["wc0"],
                          wcb=weights["wcb"], bcb=weights["bcb"])
        outs = _bwd_call(
            x_t, gy_t, glad,
            weights["w0"], weights["b0"], weights["wb"], weights["bb"],
            weights["wf"], weights["bf"],
            wh_scale=(1.0 / math.sqrt(H)) if scaled else None,
            **common, **ctx_kw,
        )
        gx, gw0, gb0, gwb, gbb, gwf, gbf = outs[:7]
        gweights = dict(w0=gw0, b0=gb0, wb=gwb, bb=gbb, wf=gwf, bf=gbf)
        if not has_context:
            return gweights, gx, None
        gctx, gwc0, gwcb, gbcb = outs[7:]
        gweights.update(wc0=gwc0, wcb=gwcb, bcb=gbcb)
        return gweights, gx, gctx

    if has_context:
        @jax.custom_vjp
        def apply(weights, x_t, ctx_t):
            return _forward(weights, x_t, ctx_t)

        def fwd(weights, x_t, ctx_t):
            return apply(weights, x_t, ctx_t), (weights, x_t, ctx_t)

        def bwd(res, cot):
            weights, x_t, ctx_t = res
            gy_t, glad = cot
            return _backward(weights, x_t, ctx_t, gy_t, glad)
    else:
        @jax.custom_vjp
        def apply(weights, x_t):
            return _forward(weights, x_t, None)

        def fwd(weights, x_t):
            return apply(weights, x_t), (weights, x_t)

        def bwd(res, cot):
            weights, x_t = res
            gy_t, glad = cot
            gweights, gx, _ = _backward(weights, x_t, None, gy_t, glad)
            return gweights, gx

    apply.defvjp(fwd, bwd)
    return apply


class FusedNSFTrainer(FusedTrainerBase):
    """Train a tabular NSF with fused Pallas forward+backward megakernels.

        trainer = FusedNSFTrainer(flow, batch_size=512)
        step = trainer.make_train_step(optax.adam(3e-4))
        weights, opt_state = trainer.weights, trainer.init_opt(optimizer)
        weights, opt_state, loss = step(weights, opt_state, batch)  # [N, D]
        trained_flow = trainer.to_flow(weights)

    The trainable pytree is the fp32 kernel-layout weight dict; because
    extraction is a pure transpose/permutation (no scale folding), Adam on
    it follows the exact trajectory of Adam on the model's own parameters
    (pinned by tests/ops/test_nsf_train.py::test_fused_adam_step_matches).
    """

    def __init__(self, flow, batch_size, interpret=None):
        from nflows_tpu.ops.pallas.nsf_fused import _extract
        from nflows_tpu.ops.pallas.rq_spline import pallas_available

        if interpret is None:
            interpret = not pallas_available()
        (self._indices, weights, self._static, self.features,
         self.context_features) = _extract(flow, jnp.float32,
                                           fold_wh_scale=False)
        if (self.context_features is not None
                and getattr(flow, "embedding_net", None) is not None):
            raise ValueError(
                "fused training takes the RAW context (identity embedding "
                "only); flows with an embedding_net train on the XLA "
                "chain, or compose nsf_train_vjp_call(has_context=True) "
                "with the embedding net yourself — its ctx gradient flows "
                "through")
        self.weights = weights
        self._flow_template = flow
        self._interpret = interpret
        self._has_ctx = self.context_features is not None
        self._init_batching(batch_size)
        self._apply = self._build_apply(self._lanes)

    # -- training (steps/loss inherited from FusedTrainerBase) -------------

    def _build_apply(self, lanes):
        return nsf_train_vjp_call(
            self._indices, self._static, lanes, self._interpret,
            has_context=self._has_ctx)

    def _build_loss_grad(self, lanes):
        return nsf_loss_grad_call(
            self._indices, self._static, lanes, self._interpret,
            has_context=self._has_ctx)

    # -- export ------------------------------------------------------------

    def to_flow(self, weights=None):
        """Write kernel-layout weights back into a standard flow (the
        inverse of extraction: un-transpose + inverse K-major reorder)."""
        from nflows_tpu.ops.pallas.nsf_fused import _layer_groups
        from nflows_tpu.transforms.base import CompositeTransform
        from nflows_tpu.transforms.stacked import (
            StackedTransform,
            stack_transforms,
        )

        weights = self.weights if weights is None else weights
        w = jax.device_get(weights)
        flow = jax.device_get(self._flow_template)
        pairs = _layer_groups(flow.transform)
        new_groups = []
        for l, (perm, cpl) in enumerate(pairs):
            net = cpl.transform_net
            T = cpl.num_transform_features
            M = w["wf"].shape[1] // T
            if self._static["spline"] in ("affine", "additive"):
                # affine params are already param-major; extraction did not
                # reorder them
                inv_order = np.arange(T * M)
            else:
                order = np.array(
                    [t * M + j for j in range(M) for t in range(T)])
                inv_order = np.argsort(order)
            has_ctx = "wc0" in w
            blocks = []
            for j, blk in enumerate(net.blocks):
                repl = dict(
                    linear_0=blk.linear_0.replace(
                        weight=jnp.asarray(w["wb"][l, 2 * j].T),
                        bias=jnp.asarray(w["bb"][l, 2 * j, :, 0])),
                    linear_1=blk.linear_1.replace(
                        weight=jnp.asarray(w["wb"][l, 2 * j + 1].T),
                        bias=jnp.asarray(w["bb"][l, 2 * j + 1, :, 0])),
                )
                if has_ctx:
                    repl["context_layer"] = blk.context_layer.replace(
                        weight=jnp.asarray(w["wcb"][l, j].T),
                        bias=jnp.asarray(w["bcb"][l, j, :, 0]))
                blocks.append(blk.replace(**repl))
            # initial layer acts on [inputs ‖ context] rows: re-concat the
            # input part (w0) with the context part (wc0) when present
            w_init = (np.concatenate([w["w0"][l].T, w["wc0"][l].T], axis=0)
                      if has_ctx else w["w0"][l].T)
            net = net.replace(
                initial_layer=net.initial_layer.replace(
                    weight=jnp.asarray(w_init),
                    bias=jnp.asarray(w["b0"][l, :, 0])),
                blocks=tuple(blocks),
                final_layer=net.final_layer.replace(
                    weight=jnp.asarray(w["wf"][l].T[:, inv_order]),
                    bias=jnp.asarray(w["bf"][l, :, 0][inv_order])),
            )
            # perm is None for bare-coupling chains (RealNVP-style — the
            # extraction's identity permutation); rebuild the layer the
            # shape it came in
            rebuilt = cpl.replace(transform_net=net)
            new_groups.append(
                rebuilt if perm is None
                else CompositeTransform([perm, rebuilt]))
        n_flat = sum(
            len(g.transforms) if isinstance(g, CompositeTransform) else 1
            for g in new_groups)
        if isinstance(flow.transform, StackedTransform):
            new_transform = stack_transforms(new_groups)
        elif n_flat == len(getattr(flow.transform, "transforms", ())):
            new_transform = CompositeTransform([
                t for g in new_groups
                for t in (g.transforms
                          if isinstance(g, CompositeTransform) else (g,))
            ])
        else:
            new_transform = CompositeTransform(new_groups)
        return flow.replace(transform=new_transform)
