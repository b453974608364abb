"""Fused TRAINING for autoregressive flows (MAF / NSF-AR): forward and
backward passes each run as one Pallas megakernel.

The recipe is nsf_train.py's, applied to the AR megakernel
(maf_flow_kernel.py): ``maf_train_vjp_call`` builds a ``jax.custom_vjp``
whose forward is the fused AR chain (log_prob direction — one MADE pass
per layer, no fixed point) and whose backward is a second Pallas kernel
that recomputes per-layer inputs in VMEM and differentiates each layer
with ``jax.vjp`` on the same traced layer function — no hand-derived
adjoints. Weight gradients accumulate across grid tiles in VMEM-resident
constant-index output blocks (TPU grids are sequential, so ``+=`` is
exact).

The MASK twist vs the coupling trainer: MADE weights are masked denses,
and the serving extraction folds mask into weight. A trainable pytree of
FOLDED weights would let masked entries drift under Adam (dense grads),
breaking the autoregressive property. ``FusedMAFTrainer`` therefore owns
the UNFOLDED weights (pure transposes/permutations of the model's own —
elementwise-optimizer equivalence) plus the static masks in kernel
layout, and folds ``w * mask`` per step in XLA outside the kernel; the
chain rule through that multiply zeroes masked-entry gradients exactly
like the XLA path's MaskedDense, so masked entries never move (Adam on a
zero-gradient entry is exactly zero). For NSF-AR the RQ width/height
1/sqrt(hidden) rescale is likewise left unfolded and applied in-kernel
(``wh_scale``).

Conditional flows train fused: the per-sample context rides the lanes and
the backward emits gradients for the additive MADE context projections
AND for the context itself. IAF (InverseTransform-wrapped) layers are
rejected by FusedMAFTrainer — their density direction is a D-step fixed
point this kernel does not differentiate — and trained instead by
``FusedIAFTrainer`` in their NATIVE sampling direction (single MADE pass
per layer) with a variational reverse-KL objective.

Reference math being differentiated:
nflows/transforms/autoregressive.py:64-128 (affine AR, softplus scale),
:329-331 (AR RQ rescale) through nflows/transforms/made.py (masked nets).

Gradient equality vs the autodiff'd XLA chain is pinned in
tests/ops/test_maf_train.py (interpret mode); TPU throughput in
benchmarks/bench_fused_train.py --family maf.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.ops.pallas._kernel_common import (
    start_weight_dmas,
    wait_dmas,
)
from nflows_tpu.ops.pallas._trainer_common import FusedTrainerBase
from nflows_tpu.ops.pallas.maf_flow_kernel import (
    _EPSILON,
    maf_flow_kernel_call,
)
from nflows_tpu.ops.pallas.nsf_flow_kernel import _rq_spline_TR, _take_rows

__all__ = ["FusedIAFTrainer", "FusedMAFTrainer", "maf_train_vjp_call"]


def _dot_f32(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _made_vals(xp, ws, num_blocks, ctx=None):
    """Residual MADE forward on weight VALUES (already mask-folded by the
    XLA-side fold): [D, R] -> [P_rows, R]. Context is additive
    (nn/made.py:296-297 initial ``+relu``, :212-213 per block)."""
    wi, bi = ws[0], ws[1]
    nb = 2 * num_blocks
    wbs = ws[2:2 + nb]
    bbs = ws[2 + nb:2 + 2 * nb]
    base = 2 + 2 * nb
    wf, bf = ws[base], ws[base + 1]
    if ctx is not None:
        wci, bci = ws[base + 2], ws[base + 3]
        wcbs = ws[base + 4:base + 4 + num_blocks]
        bcbs = ws[base + 4 + num_blocks:base + 4 + 2 * num_blocks]
    h = _dot_f32(wi, xp) + bi
    if ctx is not None:
        h = h + jnp.maximum(_dot_f32(wci, ctx) + bci, 0.0)
    for j in range(num_blocks):
        t = jnp.maximum(h, 0.0)
        t = _dot_f32(wbs[2 * j], t) + bbs[2 * j]
        if ctx is not None:
            t = t + _dot_f32(wcbs[j], ctx) + bcbs[j]
        t = jnp.maximum(t, 0.0)
        t = _dot_f32(wbs[2 * j + 1], t) + bbs[2 * j + 1]
        h = h + t
    return _dot_f32(wf, h) + bf


def _make_layer_fn(ls, transformer, num_blocks, D, wh_scale, spline_kw,
                   has_ctx=False, direction="forward"):
    """The differentiable single-MADE-pass application of ONE layer.

    ``direction="forward"`` is the MAF log_prob direction of an unwrapped
    [permutation, AR] layer: permute first, then MADE + elementwise
    forward. ``direction="inverse"`` is the IAF SAMPLING direction of an
    InverseTransform-wrapped layer (the chain's ``inverse``): MADE +
    elementwise forward on the un-permuted input, then the inverse
    permutation (matching maf_flow_kernel.py's inverse branch for
    ``wrapped`` layers). Both are single passes — no fixed point.
    Signature: (x [D, R][, ctx [C, R]], *weights) -> (y, lad_sum [1, R]).
    """

    def body(x_full, ctx, ws):
        xp = (_take_rows(x_full, ls.perm_rows)
              if direction == "forward" else x_full)
        P = _made_vals(xp, ws, num_blocks, ctx=ctx)
        if transformer == "affine":
            scale = jnp.logaddexp(P[:D], 0.0) + _EPSILON
            y = scale * xp + P[D:]
            lad = jnp.log(scale)
        else:
            if wh_scale is not None:
                KD2 = 2 * spline_kw["num_bins"] * D
                P = jnp.concatenate([P[:KD2] * wh_scale, P[KD2:]], axis=0)
            y, lad = _rq_spline_TR(xp, P, T=D, inverse=False, **spline_kw)
        if direction == "inverse":
            y = _take_rows(y, ls.inv_perm_rows)
        return y, jnp.sum(lad, axis=0, keepdims=True)

    if has_ctx:
        def layer_fn(x_full, ctx, *ws):
            return body(x_full, ctx, ws)
    else:
        def layer_fn(x_full, *ws):
            return body(x_full, None, ws)

    return layer_fn


def _slice_layer_weights(l, wi_v, bi_v, wb_v, bb_v, wf_v, bf_v,
                         num_blocks, H, P_rows,
                         wci_v=None, bci_v=None, wcb_v=None, bcb_v=None):
    """Read layer l's weight VALUES out of the flattened VMEM scratch."""
    nb = 2 * num_blocks

    def rows(ref, i, r):
        return ref[i * r:(i + 1) * r, :]

    ws = [rows(wi_v, l, H), rows(bi_v, l, H)]
    ws += [rows(wb_v, l * nb + j, H) for j in range(nb)]
    ws += [rows(bb_v, l * nb + j, H) for j in range(nb)]
    ws += [rows(wf_v, l, P_rows), rows(bf_v, l, P_rows)]
    if wci_v is not None:
        ws += [rows(wci_v, l, H), rows(bci_v, l, H)]
        ws += [rows(wcb_v, l * num_blocks + j, H) for j in range(num_blocks)]
        ws += [rows(bcb_v, l * num_blocks + j, H) for j in range(num_blocks)]
    return tuple(ws)


def _bwd_kernel(x_ref, ctx_ref, gy_ref, glad_ref,
                wi_hbm, bi_hbm, wb_hbm, bb_hbm, wf_hbm, bf_hbm,
                wci_hbm, bci_hbm, wcb_hbm, bcb_hbm,
                gx_ref, gctx_ref, gwi_ref, gbi_ref, gwb_ref, gbb_ref,
                gwf_ref, gbf_ref, gwci_ref, gbci_ref, gwcb_ref, gbcb_ref,
                wi_v, bi_v, wb_v, bb_v, wf_v, bf_v,
                wci_v, bci_v, wcb_v, bcb_v, dma_sems, *,
                layer_static, transformer, num_blocks, D, H, P_rows,
                spline_kw, wh_scale, has_context, direction):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @pl.when(pl.program_id(0) == 0)
    def _init():
        pairs = [(wi_hbm, wi_v), (bi_hbm, bi_v), (wb_hbm, wb_v),
                 (bb_hbm, bb_v), (wf_hbm, wf_v), (bf_hbm, bf_v)]
        if has_context:
            pairs += [(wci_hbm, wci_v), (bci_hbm, bci_v),
                      (wcb_hbm, wcb_v), (bcb_hbm, bcb_v)]
        dmas = start_weight_dmas(pairs, dma_sems)
        # zero the cross-tile gradient accumulators while the DMAs fly
        for ref in (gwi_ref, gbi_ref, gwb_ref, gbb_ref, gwf_ref, gbf_ref,
                    gwci_ref, gbci_ref, gwcb_ref, gbcb_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        wait_dmas(dmas)

    L = len(layer_static)
    layer_fns = [
        _make_layer_fn(layer_static[l], transformer, num_blocks, D,
                       wh_scale, spline_kw, has_ctx=has_context,
                       direction=direction)
        for l in range(L)
    ]
    cvs = ((wci_v, bci_v, wcb_v, bcb_v) if has_context
           else (None, None, None, None))
    all_ws = [
        _slice_layer_weights(l, wi_v, bi_v, wb_v, bb_v, wf_v, bf_v,
                             num_blocks, H, P_rows,
                             wci_v=cvs[0], bci_v=cvs[1], wcb_v=cvs[2],
                             bcb_v=cvs[3])
        for l in range(L)
    ]
    # execution order: the chain's forward runs layers 0..L-1; its inverse
    # (IAF sampling) runs L-1..0 (maf_flow_kernel.py's inverse branch)
    exec_order = (tuple(range(L)) if direction == "forward"
                  else tuple(range(L - 1, -1, -1)))

    # forward recompute, keeping only the per-layer INPUTS ([D, R] each)
    x = x_ref[...].astype(jnp.float32)
    ctx = ctx_ref[...].astype(jnp.float32) if has_context else None
    xs = {}
    for l in exec_order:
        xs[l] = x
        if has_context:
            x, _ = layer_fns[l](x, ctx, *all_ws[l])
        else:
            x, _ = layer_fns[l](x, *all_ws[l])

    # backward sweep: vjp of each traced layer, accumulating weight grads
    gx = gy_ref[...].astype(jnp.float32)
    glad = glad_ref[...].astype(jnp.float32)
    nb = 2 * num_blocks
    gctx = None
    for l in reversed(exec_order):
        if has_context:
            _, vjp = jax.vjp(layer_fns[l], xs[l], ctx, *all_ws[l])
            gx, gctx_l, *gws = vjp((gx, glad))
            gctx = gctx_l if gctx is None else gctx + gctx_l
        else:
            _, vjp = jax.vjp(layer_fns[l], xs[l], *all_ws[l])
            gx, *gws = vjp((gx, glad))
        gwi_ref[l * H:(l + 1) * H, :] += gws[0]
        gbi_ref[l * H:(l + 1) * H, :] += gws[1]
        for j in range(nb):
            r = (l * nb + j) * H
            gwb_ref[r:r + H, :] += gws[2 + j]
            gbb_ref[r:r + H, :] += gws[2 + nb + j]
        base = 2 + 2 * nb
        gwf_ref[l * P_rows:(l + 1) * P_rows, :] += gws[base]
        gbf_ref[l * P_rows:(l + 1) * P_rows, :] += gws[base + 1]
        if has_context:
            gwci_ref[l * H:(l + 1) * H, :] += gws[base + 2]
            gbci_ref[l * H:(l + 1) * H, :] += gws[base + 3]
            for j in range(num_blocks):
                r = (l * num_blocks + j) * H
                gwcb_ref[r:r + H, :] += gws[base + 4 + j]
                gbcb_ref[r:r + H, :] += gws[base + 4 + num_blocks + j]

    gx_ref[...] = gx
    gctx_ref[...] = (gctx if has_context
                     else jnp.zeros(gctx_ref.shape, gctx_ref.dtype))


def _bwd_call(x_t, gy_t, glad, wi, bi, wb, bb, wf, bf, *,
              layer_static, transformer, num_blocks, spline_kw, wh_scale,
              lanes, interpret, direction="forward",
              ctx_t=None, wci=None, bci=None, wcb=None, bcb=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, N = x_t.shape
    L = len(layer_static)
    H = wi.shape[0] // L
    P_rows = wf.shape[0] // L
    grid = (N // lanes,)

    has_context = ctx_t is not None
    if has_context:
        C = ctx_t.shape[0]
    else:
        C = 1
        ctx_t = jnp.zeros((1, N), dtype=jnp.float32)
        wci = jnp.zeros((1, 1), dtype=jnp.float32)
        bci = jnp.zeros((1, 1), dtype=jnp.float32)
        wcb = jnp.zeros((1, 1), dtype=jnp.float32)
        bcb = jnp.zeros((1, 1), dtype=jnp.float32)

    kernel = functools.partial(
        _bwd_kernel,
        layer_static=tuple(layer_static), transformer=transformer,
        num_blocks=num_blocks, D=D, H=H, P_rows=P_rows,
        spline_kw=dict(spline_kw or {}), wh_scale=wh_scale,
        has_context=has_context, direction=direction,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tile = lambda shape: pl.BlockSpec(  # noqa: E731
        (shape, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    acc = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(D), tile(C), tile(D), tile(1),
                  hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm],
        out_specs=[
            tile(D), tile(C),
            acc(wi), acc(bi), acc(wb), acc(bb), acc(wf), acc(bf),
            acc(wci), acc(bci), acc(wcb), acc(bcb),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, N), jnp.float32),
            jax.ShapeDtypeStruct((C, N), jnp.float32),
            jax.ShapeDtypeStruct(wi.shape, jnp.float32),
            jax.ShapeDtypeStruct(bi.shape, jnp.float32),
            jax.ShapeDtypeStruct(wb.shape, jnp.float32),
            jax.ShapeDtypeStruct(bb.shape, jnp.float32),
            jax.ShapeDtypeStruct(wf.shape, jnp.float32),
            jax.ShapeDtypeStruct(bf.shape, jnp.float32),
            jax.ShapeDtypeStruct(wci.shape, jnp.float32),
            jax.ShapeDtypeStruct(bci.shape, jnp.float32),
            jax.ShapeDtypeStruct(wcb.shape, jnp.float32),
            jax.ShapeDtypeStruct(bcb.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(wi.shape, jnp.float32),
            pltpu.VMEM(bi.shape, jnp.float32),
            pltpu.VMEM(wb.shape, jnp.float32),
            pltpu.VMEM(bb.shape, jnp.float32),
            pltpu.VMEM(wf.shape, jnp.float32),
            pltpu.VMEM(bf.shape, jnp.float32),
            pltpu.VMEM(wci.shape, jnp.float32),
            pltpu.VMEM(bci.shape, jnp.float32),
            pltpu.VMEM(wcb.shape, jnp.float32),
            pltpu.VMEM(bcb.shape, jnp.float32),
            pltpu.SemaphoreType.DMA((10,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_t, ctx_t, gy_t, glad, wi, bi, wb, bb, wf, bf, wci, bci, wcb, bcb)
    gx, gctx = outs[0], outs[1]
    core = (gx,) + tuple(outs[2:8])
    if not has_context:
        return core
    return core + (gctx,) + tuple(outs[8:12])


def maf_train_vjp_call(layer_static, transformer, num_blocks, spline_kw,
                       H, lanes, interpret, has_context=False,
                       direction="forward"):
    """Build the custom_vjp'd fused forward for AR training.

    Returns ``apply(folded, x_t[, ctx_t]) -> (y_t [D, N], lad [1, N])``
    where ``folded`` holds the mask-folded kernel-layout stacks
    (wi/bi/wb/bb/wf/bf[, wci/bci/wcb/bcb]). The backward runs the
    recompute-in-kernel Pallas pass and, with context, also produces the
    context gradient. ``direction="forward"`` is the MAF log_prob
    direction (unwrapped layers); ``direction="inverse"`` is the IAF
    sampling direction (all-wrapped chains) — both single-MADE-pass.
    """
    wh_scale = (1.0 / math.sqrt(H)) if transformer == "rq" else None
    common = dict(
        layer_static=tuple(layer_static), transformer=transformer,
        num_blocks=num_blocks, spline_kw=spline_kw, wh_scale=wh_scale,
        lanes=lanes, interpret=interpret, direction=direction,
    )

    def _forward(w, x_t, ctx_t):
        ctx_kw = {}
        if has_context:
            ctx_kw = dict(ctx_t=ctx_t, wci=w["wci"], bci=w["bci"],
                          wcb=w["wcb"], bcb=w["bcb"])
        return maf_flow_kernel_call(
            x_t, w["wi"], w["bi"], w["wb"], w["bb"], w["wf"], w["bf"],
            tuple(layer_static), inverse=(direction == "inverse"),
            num_blocks=num_blocks,
            transformer=transformer, spline_kw=spline_kw,
            wh_scale=wh_scale, lanes=lanes, interpret=interpret, **ctx_kw,
        )

    def _backward(w, x_t, ctx_t, gy_t, glad):
        ctx_kw = {}
        if has_context:
            ctx_kw = dict(ctx_t=ctx_t, wci=w["wci"], bci=w["bci"],
                          wcb=w["wcb"], bcb=w["bcb"])
        outs = _bwd_call(
            x_t, gy_t, glad,
            w["wi"], w["bi"], w["wb"], w["bb"], w["wf"], w["bf"],
            **common, **ctx_kw,
        )
        gx = outs[0]
        gw = dict(zip(("wi", "bi", "wb", "bb", "wf", "bf"), outs[1:7]))
        if not has_context:
            return gw, gx, None
        gctx = outs[7]
        gw.update(zip(("wci", "bci", "wcb", "bcb"), outs[8:12]))
        return gw, gx, gctx

    if has_context:
        @jax.custom_vjp
        def apply(w, x_t, ctx_t):
            return _forward(w, x_t, ctx_t)

        def fwd(w, x_t, ctx_t):
            return apply(w, x_t, ctx_t), (w, x_t, ctx_t)

        def bwd(res, cot):
            w, x_t, ctx_t = res
            gy_t, glad = cot
            return _backward(w, x_t, ctx_t, gy_t, glad)
    else:
        @jax.custom_vjp
        def apply(w, x_t):
            return _forward(w, x_t, None)

        def fwd(w, x_t):
            return apply(w, x_t), (w, x_t)

        def bwd(res, cot):
            w, x_t = res
            gy_t, glad = cot
            gw, gx, _ = _backward(w, x_t, None, gy_t, glad)
            return gw, gx

    apply.defvjp(fwd, bwd)
    return apply


class FusedMAFTrainer(FusedTrainerBase):
    """Train a MAF / NSF-AR with fused Pallas forward+backward megakernels.

    NOT a throughput play — measured 0.75-0.93x the XLA scan chain at
    every production batch, and the loss is structural: the AR forward is
    one MADE pass per layer, so XLA's backward has almost no residual
    traffic for the in-kernel recompute to save, while the recompute
    FLOPs (+40% backward) and the per-step mask fold (+105 us) are pure
    cost (DESIGN.md 3c round-5 settlement;
    benchmarks/profile_fused_train.py). `training.fused_trainer(auto=
    True)` therefore never selects it. It exists for its COMPOSABLE
    custom_vjp apply: the IAF/VI reverse-KL path (make_vi_train_step
    trains the sampling direction, where the fused AR kernel IS the fast
    path) and kernel-layout export for fused serving.

        trainer = FusedMAFTrainer(flow, batch_size=512)
        step = trainer.make_train_step(optax.adam(3e-4))
        weights, opt_state = trainer.weights, trainer.init_opt(optimizer)
        weights, opt_state, loss = step(weights, opt_state, batch)  # [N, D]
        trained_flow = trainer.to_flow(weights)

    The trainable pytree is the UNFOLDED fp32 kernel-layout weight dict
    (masks and the RQ rescale applied per step / in-kernel), so Adam on it
    follows the exact trajectory of Adam on the model's own parameters and
    masked entries never move. Conditional flows take
    ``step(weights, opt_state, batch, context)``.
    """

    _direction = "forward"   # IAF subclass trains the sampling direction

    def __init__(self, flow, batch_size, interpret=None):
        from nflows_tpu.ops.pallas.maf_fused import _extract
        from nflows_tpu.ops.pallas.rq_spline import pallas_available

        if interpret is None:
            interpret = not pallas_available()
        wrapped_ok = self._direction == "inverse"
        (self._static, weights, self._num_blocks, self.features,
         self._transformer, self._spline_kw, self.context_features,
         self._masks) = _extract(
            flow, jnp.float32, fold_masks=False, fold_wh_scale=False,
            allow_wrapped=wrapped_ok, return_masks=True)
        if wrapped_ok and not all(ls.wrapped for ls in self._static):
            raise ValueError(
                "the IAF trainer requires an all-wrapped "
                "(InverseTransform'd AR) chain; train plain MAF layers "
                "with FusedMAFTrainer")
        if (self.context_features is not None
                and getattr(flow, "embedding_net", None) is not None):
            raise ValueError(
                "fused training takes the RAW context (identity embedding "
                "only); flows with an embedding_net train on the XLA "
                "chain, or compose maf_train_vjp_call(has_context=True) "
                "with the embedding net yourself — its ctx gradient flows "
                "through")
        self.weights = weights
        self._flow_template = flow
        self._interpret = interpret
        self._has_ctx = self.context_features is not None
        L = len(self._static)
        self._H = weights["wi"].shape[0] // L
        self._init_batching(batch_size)
        self._apply = self._build_apply(self._lanes)

    def _build_apply(self, lanes):
        return maf_train_vjp_call(
            self._static, self._transformer, self._num_blocks,
            self._spline_kw, self._H, lanes, self._interpret,
            has_context=self._has_ctx, direction=self._direction)

    # -- training ----------------------------------------------------------

    def _fold(self, weights):
        """Mask-fold in XLA (differentiable: the chain rule zeroes masked
        gradients exactly like MaskedDense does)."""
        folded = dict(weights)
        for k in ("wi", "wb", "wf"):
            folded[k] = weights[k] * self._masks[k]
        return folded

    # -- export ------------------------------------------------------------

    def to_flow(self, weights=None):
        """Write kernel-layout weights back into a standard flow (the
        inverse of extraction: un-transpose + inverse param-major
        reorder; masks stay the model's own buffers)."""
        weights = self.weights if weights is None else weights
        w = jax.device_get(weights)
        flow = jax.device_get(self._flow_template)
        ts = list(flow.transform.transforms)
        L = len(self._static)
        H = self._H
        nb = 2 * self._num_blocks
        P_rows = w["wf"].shape[0] // L
        D = self.features
        mult = P_rows // D
        order = np.array(
            [t * mult + j for j in range(mult) for t in range(D)])
        inv_order = np.argsort(order)

        def rows(a, i, r):
            return a[i * r:(i + 1) * r]

        from nflows_tpu.transforms.base import InverseTransform

        for l in range(L):
            ar = ts[2 * l + 1]
            wrap = isinstance(ar, InverseTransform)
            if wrap:
                outer, ar = ar, ar.transform
            made = ar.autoregressive_net
            blocks = []
            for j, blk in enumerate(made.blocks):
                repl = dict(
                    linear_0=blk.linear_0.replace(
                        weight=jnp.asarray(rows(w["wb"], l * nb + 2 * j,
                                                H).T),
                        bias=jnp.asarray(rows(w["bb"], l * nb + 2 * j,
                                              H)[:, 0])),
                    linear_1=blk.linear_1.replace(
                        weight=jnp.asarray(rows(w["wb"], l * nb + 2 * j + 1,
                                                H).T),
                        bias=jnp.asarray(rows(w["bb"], l * nb + 2 * j + 1,
                                              H)[:, 0])),
                )
                if self._has_ctx:
                    r = l * self._num_blocks + j
                    repl["context_layer"] = blk.context_layer.replace(
                        weight=jnp.asarray(rows(w["wcb"], r, H).T),
                        bias=jnp.asarray(rows(w["bcb"], r, H)[:, 0]))
                blocks.append(blk.replace(**repl))
            made_repl = dict(
                initial_layer=made.initial_layer.replace(
                    weight=jnp.asarray(rows(w["wi"], l, H).T),
                    bias=jnp.asarray(rows(w["bi"], l, H)[:, 0])),
                blocks=tuple(blocks),
                final_layer=made.final_layer.replace(
                    weight=jnp.asarray(rows(w["wf"], l, P_rows).T[:,
                                                                  inv_order]),
                    bias=jnp.asarray(
                        rows(w["bf"], l, P_rows)[:, 0][inv_order])),
            )
            if self._has_ctx:
                made_repl["context_layer"] = made.context_layer.replace(
                    weight=jnp.asarray(rows(w["wci"], l, H).T),
                    bias=jnp.asarray(rows(w["bci"], l, H)[:, 0]))
            rebuilt = ar.replace(
                autoregressive_net=made.replace(**made_repl))
            ts[2 * l + 1] = (outer.replace(transform=rebuilt) if wrap
                             else rebuilt)
        new_transform = flow.transform.replace(transforms=tuple(ts))
        return flow.replace(transform=new_transform)


class FusedIAFTrainer(FusedMAFTrainer):
    """Train an IAF (all InverseTransform-wrapped AR layers) with fused
    megakernels in its NATIVE direction: sampling.

    An IAF's log_prob is a D-step fixed point (the reason FusedMAFTrainer
    rejects it), but its sampling pass — base noise through
    ``transform.inverse`` — is one MADE pass per layer. That is the
    direction IAFs are built for: variational inference, where the loss
    is the negative ELBO over the flow's own samples
    (reverse KL; Kingma et al. 2016, reference-adjacent usage)::

        trainer = FusedIAFTrainer(iaf, batch_size=512)
        step = trainer.make_vi_train_step(optax.adam(1e-3),
                                          target_log_prob)
        weights, opt_state = trainer.weights, trainer.init_opt(opt)
        weights, opt_state, elbo_loss = step(weights, opt_state, key)

    ``target_log_prob`` is any jittable [N, D] -> [N] XLA function (an
    unnormalized posterior); its gradient flows into the kernel through
    the custom_vjp's sample cotangent. ``sample_and_log_prob_fn`` exposes
    the fused (samples, log q) pair for custom objectives; the sign
    convention matches ``Flow.sample_and_log_prob`` (flows/base.py:135:
    ``log q = log N(z) - logabsdet_inverse``).
    """

    _direction = "inverse"

    def sample_and_log_prob_fn(self, weights, z_t, ctx_t=None):
        """(weights, z [D, N][, ctx [C, N]]) -> (x [D, N], log q [N])."""
        folded = self._fold(weights)
        if self._has_ctx:
            x_t, lad = self._apply(folded, z_t, ctx_t)
        else:
            x_t, lad = self._apply(folded, z_t)
        log_z = 0.5 * self.features * math.log(2.0 * math.pi)
        lq = -0.5 * jnp.sum(z_t * z_t, axis=0) - log_z - lad[0]
        return x_t, lq

    def _loss_from_apply(self, apply):
        # covers loss_fn AND every inherited step builder (single-device,
        # scan, DP) — each routes through this hook, so none can silently
        # optimize the (unavailable) density direction
        raise NotImplementedError(
            "an IAF's log_prob direction is a fixed point; this trainer "
            "optimizes the SAMPLING direction — use make_vi_train_step "
            "(negative ELBO) or sample_and_log_prob_fn for a custom "
            "objective")

    def make_vi_train_step(self, optimizer, target_log_prob, donate=True):
        """Reverse-KL step: minimize E_q[log q(x) - log p̃(x)] over the
        flow's own samples. ``step(weights, opt_state, key[, context])``
        draws a fresh ``batch_size`` base-noise batch per call."""
        import optax

        def vi_loss(weights, z_t, ctx_t):
            x_t, lq = self.sample_and_log_prob_fn(weights, z_t, ctx_t)
            return jnp.mean(lq - target_log_prob(x_t.T))

        def _update(weights, opt_state, key, context):
            z_t = jax.random.normal(
                key, (self.features, self.batch_size), dtype=jnp.float32)
            ctx_t = (None if context is None
                     else jnp.asarray(context, jnp.float32).T)
            loss, grads = jax.value_and_grad(vi_loss)(weights, z_t, ctx_t)
            updates, opt_state = optimizer.update(grads, opt_state, weights)
            return optax.apply_updates(weights, updates), opt_state, loss

        if self._has_ctx:
            def step(weights, opt_state, key, context):
                return _update(weights, opt_state, key, context)
        else:
            def step(weights, opt_state, key):
                return _update(weights, opt_state, key, None)

        return jax.jit(step, donate_argnums=(0, 1) if donate else ())
