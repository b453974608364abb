"""Fused autoregressive-flow inference path: extract a MAF / NSF-AR /
IAF into the whole-flow Pallas kernel (maf_flow_kernel.py).

``fuse_maf(flow)`` validates the structure — L x [Permutation, AR-layer]
over a StandardNormal base, where the AR layer is a
MaskedAffineAutoregressiveTransform (MAF), a
MaskedPiecewiseRationalQuadraticAutoregressiveTransform with linear tails
(NSF-AR), or either wrapped in InverseTransform (IAF) — each with a
residual-block relu MADE, no dropout/batch-norm. Conditional flows are
supported (round 3): the additive MADE context projections ride along and
are precomputed once per layer in-kernel (loop-invariant across the AR
sampling fixed point). Masks are folded into the weights, the final layer
reordered param-major (with the RQ width/height rescale folded in), and
the result is a :class:`FusedMAF` with megakernel ``sample`` /
``log_prob`` / ``sample_and_log_prob`` / ``forward`` / ``inverse``.

Inference view; fused TRAINING lives in maf_train.py (this module's
extraction serves both via fold_masks/fold_wh_scale). See
benchmarks/bench_fused_maf.py for measured throughput.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.pallas._fused_view_common import FusedFlowView
from nflows_tpu.ops.pallas.maf_flow_kernel import (
    MAFLayerStatic,
    maf_flow_kernel_call,
)

__all__ = ["FusedMAF", "fuse_maf", "can_fuse_maf"]


def can_fuse_maf(flow) -> bool:
    try:
        _extract(flow, jnp.float32)
        return True
    except (ValueError, AttributeError):
        return False


def _masked_weight_T(md):
    """Pre-masked, transposed [out, in] weight of a MaskedDense."""
    return (np.asarray(md.weight) * np.asarray(md.mask)).T


def _extract(flow, dtype, fold_masks=True, fold_wh_scale=True,
             allow_wrapped=True, return_masks=False):
    """Re-lay a qualifying AR flow's weights for the kernel.

    Serving uses the defaults (masks and the RQ width/height rescale folded
    into the weights). Fused TRAINING (maf_train.py) passes
    ``fold_masks=False, fold_wh_scale=False, return_masks=True``: the
    trainable weights stay pure transposes/permutations of the model's own
    (elementwise-optimizer equivalence — masked entries get zero gradients
    through the per-step XLA mask fold and never move under Adam), the
    masks come back in kernel layout for that fold, and the kernel applies
    the rescale via ``wh_scale``. ``allow_wrapped=False`` rejects
    InverseTransform-wrapped (IAF) layers, whose density-evaluation
    direction is a fixed point the training kernel does not differentiate.
    """
    return _extract_impl(flow, dtype, fold_masks, fold_wh_scale,
                         allow_wrapped, return_masks)


def _extract_impl(flow, dtype, fold_masks, fold_wh_scale, allow_wrapped,
                  return_masks):
    from nflows_tpu.distributions.normal import StandardNormal
    from nflows_tpu.nn.made import MADE, MaskedResidualBlock
    from nflows_tpu.transforms.autoregressive import (
        MaskedAffineAutoregressiveTransform,
        MaskedPiecewiseRationalQuadraticAutoregressiveTransform,
    )
    from nflows_tpu.transforms.base import CompositeTransform, InverseTransform
    from nflows_tpu.transforms.permutations import Permutation

    _AR_CLASSES = (MaskedAffineAutoregressiveTransform,
                   MaskedPiecewiseRationalQuadraticAutoregressiveTransform)

    if not isinstance(flow.distribution, StandardNormal):
        raise ValueError("fused path requires a StandardNormal base")
    t = flow.transform
    if not isinstance(t, CompositeTransform):
        raise ValueError("expected a CompositeTransform chain")
    ts = t.transforms
    if len(ts) % 2 or not ts:
        raise ValueError("expected [permutation, affine-AR] pairs")
    # cheap structural pre-validation before the host transfer
    # (InverseTransform-wrapped AR layers — IAF — are supported: the
    # kernel swaps the elementwise direction per branch)
    def _unwrap(t):
        if isinstance(t, InverseTransform):
            return t.transform, True
        return t, False

    for i in range(0, len(ts), 2):
        if not isinstance(ts[i], Permutation):
            raise ValueError("layer must start with a feature Permutation")
        if type(_unwrap(ts[i + 1])[0]) not in _AR_CLASSES:
            raise ValueError(
                "only affine / RQ-spline autoregressive layers are fused")

    flow = jax.device_get(flow)  # one batched host transfer (see nsf_fused)
    ts = flow.transform.transforms

    layer_static = []
    wis, bis, wbs, bbs, wfs, bfs = [], [], [], [], [], []
    wcis, bcis, wcbs, bcbs = [], [], [], []
    mis, mbs, mfs = [], [], []
    ref_cfg = None
    for i in range(0, len(ts), 2):
        perm, ar = ts[i], ts[i + 1]
        ar, wrapped = _unwrap(ar)
        if not isinstance(perm, Permutation) or perm.dim != 1:
            raise ValueError("layer must start with a feature Permutation")
        if type(ar) is MaskedAffineAutoregressiveTransform:
            transformer = "affine"
            mult = 2
            spline_cfg = None
        elif type(ar) is MaskedPiecewiseRationalQuadraticAutoregressiveTransform:
            if ar.tails != "linear":
                raise ValueError("fused NSF-AR requires tails='linear'")
            transformer = "rq"
            mult = 3 * ar.num_bins - 1
            spline_cfg = (ar.num_bins, float(ar.tail_bound),
                          float(ar.min_bin_width), float(ar.min_bin_height),
                          float(ar.min_derivative))
        else:
            raise ValueError(
                "only affine / RQ-spline autoregressive layers are fused")
        made = ar.autoregressive_net
        if not isinstance(made, MADE) or not made.use_residual_blocks:
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

        D = made.features
        H = made.hidden_features
        Cf = (None if made.context_layer is None
              else made.context_layer.weight.shape[0])
        cfg = (transformer, mult, D, H, len(made.blocks), spline_cfg, Cf)
        if ref_cfg is None:
            ref_cfg = cfg
        elif cfg != ref_cfg:
            raise ValueError("layers must be homogeneous to fuse")

        if wrapped and not allow_wrapped:
            raise ValueError(
                "InverseTransform-wrapped (IAF) layers are not supported "
                "here: the density direction is a fixed point")

        p = np.asarray(perm.permutation)
        layer_static.append(MAFLayerStatic(
            perm_rows=tuple(int(v) for v in p),
            inv_perm_rows=tuple(int(v) for v in np.argsort(p)),
            wrapped=wrapped,
        ))

        def wT(md):
            return (_masked_weight_T(md) if fold_masks
                    else np.asarray(md.weight).T)

        wis.append(wT(made.initial_layer))                        # [H, D]
        bis.append(np.asarray(made.initial_layer.bias)[:, None])
        if return_masks:
            mis.append(np.asarray(made.initial_layer.mask).T)
        if Cf is not None:
            # additive context projections (made.py:296-297, 212-213):
            # plain Dense — [C, H] weight, transposed for samples-on-lanes
            wcis.append(np.asarray(made.context_layer.weight).T)  # [H, C]
            bcis.append(np.asarray(made.context_layer.bias)[:, None])
        for blk in made.blocks:
            for lin in (blk.linear_0, blk.linear_1):
                wbs.append(wT(lin))                               # [H, H]
                bbs.append(np.asarray(lin.bias)[:, None])
                if return_masks:
                    mbs.append(np.asarray(lin.mask).T)
            if Cf is not None:
                if blk.context_layer is None:
                    raise ValueError(
                        "mixed context/context-free MADE blocks")
                wcbs.append(np.asarray(blk.context_layer.weight).T)
                bcbs.append(np.asarray(blk.context_layer.bias)[:, None])
        # final layer [H, mult*D]: the reference packs params
        # feature-major (col t*mult+j = param j of feature t,
        # autoregressive.py:96-101 / _reshape_params); reorder param-major
        # (row j*D+t) for the kernel. For the RQ transformer also fold the
        # 1/sqrt(hidden) width/height rescale (autoregressive.py:329-331 —
        # note the AR variant scales widths AND heights) into the weights
        # (unless fold_wh_scale=False: training applies it in-kernel).
        wf = wT(made.final_layer)                                 # [mult*D, H]
        bf = np.asarray(made.final_layer.bias)[:, None]
        order = np.array([t * mult + j for j in range(mult) for t in range(D)])
        scale = np.ones(mult * D, dtype=wf.dtype)
        if transformer == "rq" and fold_wh_scale:
            K = ar.num_bins
            scale[: 2 * K * D] = 1.0 / np.sqrt(H)
        wfs.append(wf[order] * scale[:, None])
        bfs.append(bf[order] * scale[:, None])
        if return_masks:
            mfs.append(np.asarray(made.final_layer.mask).T[order])

    transformer, mult, D, H, num_blocks, spline_cfg, Cf = ref_cfg
    weights = dict(
        wi=jnp.asarray(np.concatenate(wis), dtype=dtype),
        bi=jnp.asarray(np.concatenate(bis), dtype=jnp.float32),
        wb=jnp.asarray(np.concatenate(wbs), dtype=dtype),
        bb=jnp.asarray(np.concatenate(bbs), dtype=jnp.float32),
        wf=jnp.asarray(np.concatenate(wfs), dtype=dtype),
        bf=jnp.asarray(np.concatenate(bfs), dtype=jnp.float32),
    )
    if Cf is not None:
        weights.update(
            wci=jnp.asarray(np.concatenate(wcis), dtype=dtype),
            bci=jnp.asarray(np.concatenate(bcis), dtype=jnp.float32),
            wcb=jnp.asarray(np.concatenate(wcbs), dtype=dtype),
            bcb=jnp.asarray(np.concatenate(bcbs), dtype=jnp.float32),
        )
    spline_kw = None
    if transformer == "rq":
        K, tb, mbw, mbh, md = spline_cfg
        spline_kw = dict(num_bins=K, tail_bound=tb, min_bin_width=mbw,
                         min_bin_height=mbh, min_derivative=md)
    out = (layer_static, weights, num_blocks, D, transformer, spline_kw, Cf)
    if not return_masks:
        return out
    masks = dict(
        wi=jnp.asarray(np.concatenate(mis), dtype=dtype),
        wb=jnp.asarray(np.concatenate(mbs), dtype=dtype),
        wf=jnp.asarray(np.concatenate(mfs), dtype=dtype),
    )
    return out + (masks,)


class FusedMAF(FusedFlowView):
    """Megakernel-backed inference view of a MAF. See nsf_fused.FusedNSF
    for the API contract. Conditional flows are supported (round 3): the
    embedding net runs once outside the kernel, the embedded per-sample
    context rides the lanes, and the additive MADE context projections
    (nn/made.py:296-297, 212-213) are precomputed ONCE per layer inside
    the kernel — constant across the D-step AR sampling fixed point, so
    conditional sampling pays one set of context GEMMs, not D."""

    def __init__(self, flow, dtype=jnp.bfloat16, lanes: int = 2048,
                 interpret: bool = False):
        (self._static, self._weights, self._num_blocks, self.features,
         self._transformer, self._spline_kw,
         self.context_features) = _extract(flow, dtype)
        self._embedding_net = getattr(flow, "embedding_net", None)
        self._lanes = lanes
        self._interpret = interpret
        self._build_runners()

    def _build_runners(self):
        has_ctx = self.context_features is not None

        def run(x_t, ctx_t, inverse):
            w = self._weights
            ctx_kw = {}
            if has_ctx:
                ctx_kw = dict(ctx_t=ctx_t, wci=w["wci"], bci=w["bci"],
                              wcb=w["wcb"], bcb=w["bcb"])
            return maf_flow_kernel_call(
                x_t, w["wi"], w["bi"], w["wb"], w["bb"], w["wf"], w["bf"],
                self._static, inverse=inverse, num_blocks=self._num_blocks,
                transformer=self._transformer, spline_kw=self._spline_kw,
                lanes=self._lanes, interpret=self._interpret, **ctx_kw,
            )

        self._run_fwd = jax.jit(lambda x_t, ctx_t: run(x_t, ctx_t, False))
        self._run_inv = jax.jit(lambda x_t, ctx_t: run(x_t, ctx_t, True))


def fuse_maf(flow, dtype=jnp.bfloat16, lanes: int = 2048,
             interpret: Optional[bool] = None) -> FusedMAF:
    """Build the fused inference view of a MAF. ``dtype`` sets the MADE
    GEMM precision (bf16 default; jnp.float32 for full precision)."""
    if interpret is None:
        from nflows_tpu.ops.pallas.rq_spline import pallas_available
        interpret = not pallas_available()
    return FusedMAF(flow, dtype=dtype, lanes=lanes, interpret=interpret)
