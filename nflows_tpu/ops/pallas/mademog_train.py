"""Fused TRAINING for the MADEMoG mixture-density family: forward and
backward passes each run as one Pallas megakernel.

The recipe is maf_train.py's, one notch simpler because the density is a
single parallel MADE pass + the MoG head (no chain, no per-layer sweep):
``mademog_train_vjp_call`` builds a ``jax.custom_vjp`` whose forward is
the serving log_prob kernel (mademog_fused.py) and whose backward is a
second Pallas kernel that recomputes the MADE+head in VMEM and
differentiates it with ``jax.vjp`` on the same traced function — no
hand-derived adjoints. Weight gradients accumulate across grid tiles in
VMEM-resident constant-index output blocks (TPU grids are sequential, so
``+=`` is exact).

Masks follow maf_train.py's twist: the trainable pytree holds UNFOLDED
weights (pure transposes/permutations of the model's own — elementwise-
optimizer equivalence), and ``FusedMADEMoGTrainer._fold`` multiplies in
the static masks per step in XLA; the chain rule through that multiply
zeroes masked-entry gradients exactly like MaskedDense, so masked entries
never move under Adam.

Reference math being differentiated:
nflows/nn/nde/made.py:284-354 (MoG log_prob: per-feature log-softmax
mixture weights, softplus stds, logsumexp over components) through
nflows/transforms/made.py (masked residual nets).

Gradient and Adam-trajectory equality vs the autodiff'd XLA chain is
pinned in tests/ops/test_mademog_train.py (interpret mode); TPU
throughput in benchmarks/bench_fused_train.py --family mademog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.ops.pallas._kernel_common import (
    start_weight_dmas,
    wait_dmas,
)
from nflows_tpu.ops.pallas._trainer_common import FusedTrainerBase
from nflows_tpu.ops.pallas.mademog_fused import (
    _extract,
    _mog_log_prob_TR,
    mademog_log_prob_call,
)
from nflows_tpu.ops.pallas.maf_train import _made_vals

__all__ = ["FusedMADEMoGTrainer", "mademog_train_vjp_call"]


def _make_mog_fn(D, K, epsilon, num_blocks, has_ctx):
    """The differentiable whole-model application: MADE pass + MoG head.
    Signature (x [D, R][, ctx [C, R]], *weights) -> lp [1, R], with the
    flat weight layout ``maf_train._made_vals`` expects."""

    def body(x, ctx, ws):
        P = _made_vals(x, ws, num_blocks, ctx=ctx)       # [3KD, R]
        return _mog_log_prob_TR(x, P, K=K, D=D, epsilon=epsilon)

    if has_ctx:
        def fn(x, ctx, *ws):
            return body(x, ctx, ws)
    else:
        def fn(x, *ws):
            return body(x, None, ws)

    return fn


def _flat_ws(wi_v, bi_v, wb_v, bb_v, wf_v, bf_v, num_blocks, H,
             wci_v=None, bci_v=None, wcb_v=None, bcb_v=None):
    """Read the weight VALUES out of VMEM scratch in _made_vals layout."""
    nb = 2 * num_blocks
    ws = [wi_v[...], bi_v[...]]
    ws += [wb_v[j * H:(j + 1) * H, :] for j in range(nb)]
    ws += [bb_v[j * H:(j + 1) * H, :] for j in range(nb)]
    ws += [wf_v[...], bf_v[...]]
    if wci_v is not None:
        ws += [wci_v[...], bci_v[...]]
        ws += [wcb_v[j * H:(j + 1) * H, :] for j in range(num_blocks)]
        ws += [bcb_v[j * H:(j + 1) * H, :] for j in range(num_blocks)]
    return tuple(ws)


def _bwd_kernel(x_ref, ctx_ref, glp_ref,
                wi_hbm, bi_hbm, wb_hbm, bb_hbm, wf_hbm, bf_hbm,
                wci_hbm, bci_hbm, wcb_hbm, bcb_hbm,
                gx_ref, gctx_ref, gwi_ref, gbi_ref, gwb_ref, gbb_ref,
                gwf_ref, gbf_ref, gwci_ref, gbci_ref, gwcb_ref, gbcb_ref,
                wi_v, bi_v, wb_v, bb_v, wf_v, bf_v,
                wci_v, bci_v, wcb_v, bcb_v, dma_sems, *,
                D, K, H, num_blocks, epsilon, has_context):
    from jax.experimental import pallas as pl

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

    fn = _make_mog_fn(D, K, epsilon, num_blocks, has_context)
    cvs = ((wci_v, bci_v, wcb_v, bcb_v) if has_context
           else (None, None, None, None))
    ws = _flat_ws(wi_v, bi_v, wb_v, bb_v, wf_v, bf_v, num_blocks, H,
                  wci_v=cvs[0], bci_v=cvs[1], wcb_v=cvs[2], bcb_v=cvs[3])

    x = x_ref[...].astype(jnp.float32)
    glp = glp_ref[...].astype(jnp.float32)
    nb = 2 * num_blocks
    if has_context:
        ctx = ctx_ref[...].astype(jnp.float32)
        _, vjp = jax.vjp(fn, x, ctx, *ws)
        gx, gctx, *gws = vjp(glp)
    else:
        _, vjp = jax.vjp(fn, x, *ws)
        gx, *gws = vjp(glp)
        gctx = None

    gwi_ref[...] += gws[0]
    gbi_ref[...] += gws[1]
    for j in range(nb):
        gwb_ref[j * H:(j + 1) * H, :] += gws[2 + j]
        gbb_ref[j * H:(j + 1) * H, :] += gws[2 + nb + j]
    base = 2 + 2 * nb
    gwf_ref[...] += gws[base]
    gbf_ref[...] += gws[base + 1]
    if has_context:
        gwci_ref[...] += gws[base + 2]
        gbci_ref[...] += gws[base + 3]
        for j in range(num_blocks):
            gwcb_ref[j * H:(j + 1) * H, :] += gws[base + 4 + j]
            gbcb_ref[j * H:(j + 1) * H, :] += gws[base + 4 + num_blocks + j]

    gx_ref[...] = gx
    gctx_ref[...] = (gctx if has_context
                     else jnp.zeros(gctx_ref.shape, gctx_ref.dtype))


def _bwd_call(x_t, glp, w, *, static, lanes, interpret, ctx_t=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, N = x_t.shape
    grid = (N // lanes,)
    has_context = ctx_t is not None
    if has_context:
        C = ctx_t.shape[0]
        cw = (w["wci"], w["bci"], w["wcb"], w["bcb"])
    else:
        C = 1
        ctx_t = jnp.zeros((1, N), dtype=jnp.float32)
        cw = tuple(jnp.zeros((1, 1), dtype=jnp.float32) for _ in range(4))

    kernel = functools.partial(
        _bwd_kernel, D=D, K=static["K"], H=static["H"],
        num_blocks=static["num_blocks"], epsilon=static["epsilon"],
        has_context=has_context,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (r, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    acc = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    core_w = (w["wi"], w["bi"], w["wb"], w["bb"], w["wf"], w["bf"])
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(D), tile(C), tile(1)] + [hbm] * 10,
        out_specs=[tile(D), tile(C)]
        + [acc(a) for a in core_w] + [acc(a) for a in cw],
        out_shape=[jax.ShapeDtypeStruct((D, N), jnp.float32),
                   jax.ShapeDtypeStruct((C, N), jnp.float32)]
        + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in core_w]
        + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in cw],
        scratch_shapes=[pltpu.VMEM(a.shape, jnp.float32)
                        for a in core_w + cw]
        + [pltpu.SemaphoreType.DMA((10,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_t, ctx_t, glp, *core_w, *cw)
    gx, gctx = outs[0], outs[1]
    gw = dict(zip(("wi", "bi", "wb", "bb", "wf", "bf"), outs[2:8]))
    if has_context:
        gw.update(zip(("wci", "bci", "wcb", "bcb"), outs[8:12]))
    return gw, gx, gctx


def mademog_train_vjp_call(static, lanes, interpret, has_context=False):
    """Build the custom_vjp'd fused forward for MADEMoG training.

    Returns ``apply(folded, x_t[, ctx_t]) -> lp [1, N]`` where ``folded``
    holds the mask-folded kernel-layout weights (wi/bi/wb/bb/wf/bf
    [, wci/bci/wcb/bcb]). The backward runs the recompute-in-kernel
    Pallas pass; the input cotangent (gx) flows too, so the apply
    composes with downstream objectives."""

    def _forward(w, x_t, ctx_t):
        return mademog_log_prob_call(
            x_t, weights=w, static=static, lanes=lanes,
            interpret=interpret, ctx_t=ctx_t)

    def _backward(w, x_t, ctx_t, glp):
        return _bwd_call(x_t, glp, w, static=static, lanes=lanes,
                         interpret=interpret, ctx_t=ctx_t)

    if has_context:
        @jax.custom_vjp
        def apply(w, x_t, ctx_t):
            return _forward(w, x_t, ctx_t)

        def fwd(w, x_t, ctx_t):
            return apply(w, x_t, ctx_t), (w, x_t, ctx_t)

        def bwd(res, glp):
            w, x_t, ctx_t = res
            return _backward(w, x_t, ctx_t, glp)
    else:
        @jax.custom_vjp
        def apply(w, x_t):
            return _forward(w, x_t, None)

        def fwd(w, x_t):
            return apply(w, x_t), (w, x_t)

        def bwd(res, glp):
            w, x_t = res
            gw, gx, _ = _backward(w, x_t, None, glp)
            return gw, gx

    apply.defvjp(fwd, bwd)
    return apply


class FusedMADEMoGTrainer(FusedTrainerBase):
    """Train a MADEMoG / MixtureOfGaussiansMADE with fused Pallas
    forward+backward megakernels.

    NOT a throughput play — measured 0.84-0.98x the XLA chain at every
    production batch: the single-MADE-pass XLA backward is ~22 us (fully
    fused) while the in-kernel recompute costs ~86 us, and there is no
    residual traffic to save (DESIGN.md 3c round-5 settlement;
    benchmarks/profile_fused_train.py --family mademog).
    `training.fused_trainer(auto=True)` never selects it; use it for the
    composable custom_vjp apply (input cotangents for composed
    objectives) or stay on the XLA chain for throughput.

        trainer = FusedMADEMoGTrainer(dist, batch_size=512)
        step = trainer.make_train_step(optax.adam(3e-4))
        weights, opt_state = trainer.weights, trainer.init_opt(opt)
        weights, opt_state, loss = step(weights, opt_state, batch)  # [N, D]
        trained = trainer.to_dist(weights)

    The trainable pytree is the UNFOLDED fp32 kernel-layout weight dict
    (masks applied per step), so Adam on it follows the exact trajectory
    of Adam on the model's own parameters and masked entries never move.
    Conditional models take ``step(weights, opt_state, batch, context)``.
    """

    def __init__(self, dist, batch_size, interpret=None):
        from nflows_tpu.ops.pallas.rq_spline import pallas_available

        if interpret is None:
            interpret = not pallas_available()
        (self.weights, self._static, self.context_features,
         self._masks) = _extract(dist, jnp.float32, fold_masks=False,
                                 return_masks=True)
        self._dist_template = dist
        self.features = self._static["D"]
        self._interpret = interpret
        self._has_ctx = self.context_features is not None
        self._init_batching(batch_size)
        self._apply = self._build_apply(self._lanes)

    def _build_apply(self, lanes):
        return mademog_train_vjp_call(
            self._static, lanes, self._interpret,
            has_context=self._has_ctx)

    # -- training ----------------------------------------------------------

    def _fold(self, weights):
        """Mask-fold in XLA (differentiable: the chain rule zeroes masked
        gradients exactly like MaskedDense does)."""
        folded = dict(weights)
        for k in ("wi", "wb", "wf"):
            folded[k] = weights[k] * self._masks[k]
        return folded

    def _loss_from_apply(self, apply):
        """-mean log_prob; the kernel returns lp directly (no base-measure
        term — the MoG head IS the density), so the base-class
        noise-plus-logdet assembly is replaced wholesale."""

        def loss(weights, batch_t, ctx_t=None):
            self._guard_ctx(ctx_t)
            folded = self._fold(weights)
            lp = (apply(folded, batch_t, ctx_t) if self._has_ctx
                  else apply(folded, batch_t))
            return -jnp.mean(lp[0])

        return loss

    # -- export ------------------------------------------------------------

    def to_made(self, weights=None):
        """Write kernel-layout weights back into the model (inverse of
        extraction: un-transpose + inverse K-major reorder; masks stay
        the model's own buffers)."""
        weights = self.weights if weights is None else weights
        w = jax.device_get(weights)
        dist = jax.device_get(self._dist_template)
        made = getattr(dist, "made", dist)
        D, K, H = self.features, self._static["K"], self._static["H"]
        order = np.array([d * 3 * K + k * 3 + j
                          for j in range(3) for k in range(K)
                          for d in range(D)])
        inv_order = np.argsort(order)

        blocks = []
        for j, blk in enumerate(made.blocks):
            repl = dict(
                linear_0=blk.linear_0.replace(
                    weight=jnp.asarray(w["wb"][2 * j * H:(2 * j + 1) * H].T),
                    bias=jnp.asarray(
                        w["bb"][2 * j * H:(2 * j + 1) * H, 0])),
                linear_1=blk.linear_1.replace(
                    weight=jnp.asarray(
                        w["wb"][(2 * j + 1) * H:(2 * j + 2) * H].T),
                    bias=jnp.asarray(
                        w["bb"][(2 * j + 1) * H:(2 * j + 2) * H, 0])),
            )
            if self._has_ctx:
                repl["context_layer"] = blk.context_layer.replace(
                    weight=jnp.asarray(w["wcb"][j * H:(j + 1) * H].T),
                    bias=jnp.asarray(w["bcb"][j * H:(j + 1) * H, 0]))
            blocks.append(blk.replace(**repl))
        made_repl = dict(
            initial_layer=made.initial_layer.replace(
                weight=jnp.asarray(w["wi"].T),
                bias=jnp.asarray(w["bi"][:, 0])),
            blocks=tuple(blocks),
            final_layer=made.final_layer.replace(
                weight=jnp.asarray(w["wf"][inv_order].T),
                bias=jnp.asarray(w["bf"][inv_order][:, 0])),
        )
        if self._has_ctx:
            made_repl["context_layer"] = made.context_layer.replace(
                weight=jnp.asarray(w["wci"].T),
                bias=jnp.asarray(w["bci"][:, 0]))
        return made.replace(**made_repl)

    def to_dist(self, weights=None):
        """Like :meth:`to_made`, re-wrapping a MADEMoG distribution when
        the trainer was built from one."""
        rebuilt = self.to_made(weights)
        dist = self._dist_template
        if hasattr(dist, "made"):
            return jax.device_get(dist).replace(made=rebuilt)
        return rebuilt
