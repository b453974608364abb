"""Fused log_prob for MixtureOfGaussiansMADE / MADEMoG — the last model
family without a megakernel path.

The density is one parallel MADE pass + a per-feature mixture-of-Gaussians
reduction (nn/nde/made.py:86-100, reference nflows/nn/nde/made.py:284-354):
no chain, no fixed point. The kernel runs the whole thing in VMEM with
samples on lanes: masked MADE GEMMs on the MXU, then the MoG stage on a
K-major [3·K·D, R] parameter layout (log-softmax over components, softplus
stds, logsumexp over K, sum over D).

Sampling stays on the XLA path (``MixtureOfGaussiansMADE.sample`` — a
sequential per-feature pass with categorical/normal draws; in-kernel RNG
is not worth the Mosaic risk for a D-step loop that XLA already compiles
well). ``FusedMADEMoG.sample`` delegates so the object is drop-in.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.pallas._kernel_common import (
    start_weight_dmas,
    wait_dmas,
)
from nflows_tpu.ops.pallas.maf_flow_kernel import _made_forward

__all__ = ["FusedMADEMoG", "fuse_mademog", "can_fuse_mademog"]


def can_fuse_mademog(dist) -> bool:
    """Structural qualification only — no weight transfer (a device_get
    through a remote-TPU tunnel just to answer a boolean would be the
    pathology nsf_fused._extract's layout comment warns about)."""
    try:
        _validate(dist)
        return True
    except (ValueError, AttributeError):
        return False


def _validate(dist):
    """Check the model qualifies for the kernel; return the MADE (still
    on device). Raises ValueError with the disqualifying reason."""
    from nflows_tpu.distributions.mixture import MADEMoG
    from nflows_tpu.nn.made import MaskedResidualBlock
    from nflows_tpu.nn.nde.made import MixtureOfGaussiansMADE

    made = dist.made if isinstance(dist, MADEMoG) else dist
    if not isinstance(made, MixtureOfGaussiansMADE):
        raise ValueError("expected a MixtureOfGaussiansMADE (or MADEMoG)")
    if not made.use_residual_blocks:
        raise ValueError("fused path requires residual-block MADE")
    if made.activation is not jax.nn.relu:
        raise ValueError("fused MADE requires relu activation")
    for blk in made.blocks:
        if not isinstance(blk, MaskedResidualBlock):
            raise ValueError("fused path requires residual MADE blocks")
        if blk.dropout.rate != 0.0:
            raise ValueError("dropout MADE not fused")
        if blk.batch_norm_0 is not None:
            raise ValueError("batch-norm MADE not fused")
        if blk.activation is not jax.nn.relu:
            raise ValueError("fused MADE requires relu activation")
    return made


def _extract(dist, dtype, fold_masks=True, return_masks=False):
    """Re-lay a qualifying MADEMoG's weights for the kernel. Serving uses
    the defaults (masks folded into the weights); the fused trainer
    (mademog_train.py) passes ``fold_masks=False, return_masks=True`` so
    the trainable weights stay pure transposes/permutations of the
    model's own, with the static masks returned in kernel layout for the
    per-step XLA fold."""
    made = jax.device_get(_validate(dist))
    D = made.features
    K = made.num_mixture_components
    H = made.hidden_features
    Cf = (None if made.context_layer is None
          else int(made.context_layer.weight.shape[0]))

    def wT(md):
        w = np.asarray(md.weight)
        return (w * np.asarray(md.mask)).T if fold_masks else w.T

    def mT(md):
        return np.asarray(md.mask, np.float32).T

    wi = wT(made.initial_layer)                                # [H, D]
    bi = np.asarray(made.initial_layer.bias)[:, None]
    wbs, bbs = [], []
    for blk in made.blocks:
        for lin in (blk.linear_0, blk.linear_1):
            wbs.append(wT(lin))
            bbs.append(np.asarray(lin.bias)[:, None])
    # final layer: model packs col d*3K + k*3 + j (j = logit/mean/ustd —
    # nn/nde/made.py:_mixture_params reshape [.., K, 3]); reorder to the
    # K-major kernel layout row (j*K + k)*D + d so each j-group is K
    # stacked [D]-blocks
    wf = wT(made.final_layer)                                  # [3KD, H]
    bf = np.asarray(made.final_layer.bias)[:, None]
    order = np.array([d * 3 * K + k * 3 + j
                      for j in range(3) for k in range(K) for d in range(D)])
    weights = dict(
        wi=jnp.asarray(wi, dtype=dtype),
        bi=jnp.asarray(bi, dtype=jnp.float32),
        wb=jnp.asarray(np.concatenate(wbs), dtype=dtype),
        bb=jnp.asarray(np.concatenate(bbs), dtype=jnp.float32),
        wf=jnp.asarray(wf[order], dtype=dtype),
        bf=jnp.asarray(bf[order], dtype=jnp.float32),
    )
    if Cf is not None:
        weights.update(
            wci=jnp.asarray(np.asarray(made.context_layer.weight).T,
                            dtype=dtype),
            bci=jnp.asarray(np.asarray(made.context_layer.bias)[:, None],
                            dtype=jnp.float32),
            wcb=jnp.asarray(np.concatenate(
                [np.asarray(b.context_layer.weight).T
                 for b in made.blocks]), dtype=dtype),
            bcb=jnp.asarray(np.concatenate(
                [np.asarray(b.context_layer.bias)[:, None]
                 for b in made.blocks]), dtype=jnp.float32),
        )
    static = dict(D=D, K=K, H=H, num_blocks=len(made.blocks),
                  epsilon=float(made.epsilon))
    if not return_masks:
        return weights, static, Cf
    masks = dict(
        wi=jnp.asarray(mT(made.initial_layer), dtype=dtype),
        wb=jnp.asarray(np.concatenate(
            [mT(lin) for blk in made.blocks
             for lin in (blk.linear_0, blk.linear_1)]), dtype=dtype),
        wf=jnp.asarray(mT(made.final_layer)[order], dtype=dtype),
    )
    return weights, static, Cf, masks


def _mog_log_prob_TR(x, P, *, K, D, epsilon):
    """MoG head on the K-major [3KD, R] MADE output: per-feature
    log-softmax mixture weights, softplus stds, logsumexp over components,
    sum over features (nn/nde/made.py:82-100; reference
    nflows/nn/nde/made.py:284-354). Returns lp [1, R]. Shared between the
    serving kernel and the fused trainer's differentiable recompute."""
    KD = K * D
    logits = P[:KD].reshape(K, D, x.shape[1])
    means = P[KD:2 * KD].reshape(K, D, x.shape[1])
    ustds = P[2 * KD:].reshape(K, D, x.shape[1])

    # log-softmax over components (nn/nde/made.py:82)
    m = jnp.max(logits, axis=0, keepdims=True)
    log_coef = (logits - m) - jnp.log(
        jnp.sum(jnp.exp(logits - m), axis=0, keepdims=True))
    stds = jnp.logaddexp(ustds, 0.0) + epsilon          # softplus + eps
    comp_lp = log_coef - 0.5 * (
        jnp.log(jnp.asarray(2.0 * jnp.pi, jnp.float32))
        + 2.0 * jnp.log(stds)
        + ((x[None] - means) / stds) ** 2
    )                                                   # [K, D, R]
    cm = jnp.max(comp_lp, axis=0)
    lp_d = cm + jnp.log(jnp.sum(jnp.exp(comp_lp - cm[None]), axis=0))
    return jnp.sum(lp_d, axis=0, keepdims=True)         # [1, R]


def _kernel(x_ref, ctx_ref, wi_hbm, bi_hbm, wb_hbm, bb_hbm, wf_hbm, bf_hbm,
            wci_hbm, bci_hbm, wcb_hbm, bcb_hbm,
            lp_ref,
            wi_v, bi_v, wb_v, bb_v, wf_v, bf_v,
            wci_v, bci_v, wcb_v, bcb_v, dma_sems, *,
            D, K, H, num_blocks, epsilon, has_context):
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

    nb = 2 * num_blocks
    x = x_ref[...].astype(jnp.float32)          # [D, R]

    c_init = c_blks = None
    if has_context:
        ctx = ctx_ref[...].astype(jnp.float32)  # [C, R]
        gate = jax.lax.dot_general(
            wci_v[...], ctx.astype(wci_v.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        c_init = jnp.maximum(gate + bci_v[...], 0.0)
        c_blks = []
        for j in range(num_blocks):
            w = wcb_v[j * H:(j + 1) * H, :]
            c_blks.append(jax.lax.dot_general(
                w, ctx.astype(w.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                + bcb_v[j * H:(j + 1) * H, :])

    wbs = [wb_v[j * H:(j + 1) * H, :] for j in range(nb)]
    bbs = [bb_v[j * H:(j + 1) * H, :] for j in range(nb)]
    P = _made_forward(x, wi_v[...], bi_v[...], wbs, bbs,
                      wf_v[...], bf_v[...], num_blocks,
                      c_init=c_init, c_blks=c_blks)     # [3KD, R]
    lp_ref[...] = _mog_log_prob_TR(x, P, K=K, D=D, epsilon=epsilon)


def mademog_log_prob_call(x_t, weights, static, *, lanes=1024,
                          interpret=False, ctx_t=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, N = x_t.shape
    if N % lanes:
        raise ValueError(f"N={N} must be a multiple of lanes={lanes}")
    grid = (N // lanes,)

    has_context = ctx_t is not None
    w = weights
    if has_context:
        if "wci" not in w:
            raise ValueError("context passed but weights have no context "
                             "projections")
        C = ctx_t.shape[0]
        cw = (w["wci"], w["bci"], w["wcb"], w["bcb"])
    else:
        C = 1
        ctx_t = jnp.zeros((1, N), dtype=jnp.float32)
        cw = tuple(jnp.zeros((1, 1), dtype=jnp.float32) for _ in range(4))

    kernel = functools.partial(
        _kernel, D=D, K=static["K"], H=static["H"],
        num_blocks=static["num_blocks"], epsilon=static["epsilon"],
        has_context=has_context,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (r, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)

    (lp,) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(D), tile(C)] + [hbm] * 10,
        out_specs=[tile(1)],
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM(w["wi"].shape, w["wi"].dtype),
            pltpu.VMEM(w["bi"].shape, w["bi"].dtype),
            pltpu.VMEM(w["wb"].shape, w["wb"].dtype),
            pltpu.VMEM(w["bb"].shape, w["bb"].dtype),
            pltpu.VMEM(w["wf"].shape, w["wf"].dtype),
            pltpu.VMEM(w["bf"].shape, w["bf"].dtype),
            pltpu.VMEM(cw[0].shape, cw[0].dtype),
            pltpu.VMEM(cw[1].shape, cw[1].dtype),
            pltpu.VMEM(cw[2].shape, cw[2].dtype),
            pltpu.VMEM(cw[3].shape, cw[3].dtype),
            pltpu.SemaphoreType.DMA((10,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_t, ctx_t, w["wi"], w["bi"], w["wb"], w["bb"], w["wf"], w["bf"],
      *cw)
    return lp


class FusedMADEMoG:
    """Megakernel log_prob for a MixtureOfGaussiansMADE / MADEMoG;
    sampling delegates to the XLA path (sequential per-feature draws)."""

    def __init__(self, dist, dtype=jnp.bfloat16, lanes: int = 1024,
                 interpret: bool = False):
        self._weights, self._static, self.context_features = _extract(
            dist, dtype)
        self._dist = dist
        self.features = self._static["D"]
        self._lanes = lanes
        self._interpret = interpret
        self._run = jax.jit(functools.partial(
            mademog_log_prob_call, weights=self._weights,
            static=self._static, lanes=lanes, interpret=interpret))
        self._run_ctx = jax.jit(lambda x_t, ctx_t: mademog_log_prob_call(
            x_t, weights=self._weights, static=self._static, lanes=lanes,
            interpret=interpret, ctx_t=ctx_t))

    def log_prob(self, inputs, context=None):
        n = inputs.shape[0]
        if inputs.ndim != 2 or inputs.shape[1] != self.features:
            raise ValueError(
                f"expected [N, {self.features}] inputs, got {inputs.shape}")
        if (context is None) != (self.context_features is None):
            raise ValueError(
                "context presence must match the MADE's context_features")
        if context is not None and context.shape[0] != n:
            raise ValueError(
                f"context has {context.shape[0]} rows but inputs have {n}")
        pad = (-n) % self._lanes
        x_t = jnp.asarray(inputs, jnp.float32).T
        ctx_t = (None if context is None
                 else jnp.asarray(context, jnp.float32).T)
        if pad:
            x_t = jnp.pad(x_t, ((0, 0), (0, pad)))
            if ctx_t is not None:
                ctx_t = jnp.pad(ctx_t, ((0, 0), (0, pad)))
        lp = (self._run(x_t) if ctx_t is None
              else self._run_ctx(x_t, ctx_t))
        return lp[0, :n]

    def sample(self, key, num_samples, context=None):
        made = getattr(self._dist, "made", self._dist)
        return made.sample(key, num_samples, context=context)


def fuse_mademog(dist, dtype=jnp.bfloat16, lanes: int = 1024,
                 interpret: Optional[bool] = None) -> FusedMADEMoG:
    """Build the fused log_prob view of a MADEMoG / MixtureOfGaussiansMADE."""
    if interpret is None:
        from nflows_tpu.ops.pallas.rq_spline import pallas_available
        interpret = not pallas_available()
    return FusedMADEMoG(dist, dtype=dtype, lanes=lanes, interpret=interpret)
