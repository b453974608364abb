"""Fused NSF inference path: extract a tabular RQ-NSF flow into the
whole-flow Pallas kernel (nsf_flow_kernel.py) and expose sample /
log_prob / sample_and_log_prob at megakernel speed.

``fuse_nsf(flow)`` validates the model structure (L homogeneous
[Permutation?, coupling(ResidualNet)] layers — any spline coupling
family (RQ/LRS/linear/quadratic/cubic) with tails='linear', or
affine/additive (RealNVP/NICE) couplings whose
alternating masks need no interleaved permutations — relu, no
dropout/batch-norm), re-lays the weights out for the kernel — transposed
for the samples-on-lanes layout, final-layer columns permuted K-major,
the softmax 1/sqrt(hidden) scale folded in (reference
coupling.py:554-563) — and returns a :class:`FusedNSF` whose methods run
the whole transform chain as ONE ``pallas_call``.

This is an inference object: no gradients flow through it (training uses
the autodiff'd XLA chain; this exists to win the sampling/eval
throughput race — see benchmarks/bench_fused_nsf.py and BASELINE.md).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.ops.pallas._fused_view_common import FusedFlowView
from nflows_tpu.ops.pallas.nsf_flow_kernel import (
    LANES_DEFAULT,
    nsf_flow_kernel_call,
)

__all__ = ["FusedNSF", "fuse_nsf", "can_fuse_nsf"]


class NSFLayerIndices(NamedTuple):
    """Static per-layer row-index lists (host ints), all in x-row space.

    forward layer l:  identity = x[id_rows], transform = x[tr_rows],
                      x_next = concat(identity, spline_fwd)[merge_fwd]
    inverse layer l:  identity = y[id_idx], transform = y[tr_idx],
                      x = concat(identity, spline_inv)[merge_inv]
    """

    id_rows: Tuple[int, ...]     # perm composed with mask identity split
    tr_rows: Tuple[int, ...]     # perm composed with mask transform split
    merge_fwd: Tuple[int, ...]   # argsort(concat(id_idx, tr_idx))
    id_idx: Tuple[int, ...]      # mask identity split (coupling coords)
    tr_idx: Tuple[int, ...]
    merge_inv: Tuple[int, ...]   # merge then inverse permutation, composed




def _layer_groups(transform):
    """Yield (permutation-or-None, coupling) pairs from the flow's
    transform. A coupling with no preceding Permutation (RealNVP's
    alternating-mask style, flows/realnvp.py) gets ``None`` — extraction
    treats it as the identity permutation."""
    from nflows_tpu.transforms.base import CompositeTransform
    from nflows_tpu.transforms.coupling import CouplingTransform
    from nflows_tpu.transforms.permutations import Permutation
    from nflows_tpu.transforms.stacked import StackedTransform

    if isinstance(transform, StackedTransform):
        groups = [
            tuple(g.transforms) if isinstance(g, CompositeTransform) else (g,)
            for g in transform.layers()
        ]
    elif isinstance(transform, CompositeTransform):
        groups = []
        ts = list(transform.transforms)
        i = 0
        while i < len(ts):
            t = ts[i]
            if isinstance(t, Permutation):
                if i + 1 >= len(ts):
                    raise ValueError("trailing permutation with no coupling")
                groups.append((t, ts[i + 1]))
                i += 2
            elif isinstance(t, CouplingTransform):
                groups.append((t,))
                i += 1
            else:
                raise ValueError(
                    f"unsupported transform in chain: {type(t).__name__}")
    else:
        raise ValueError(f"unsupported transform type {type(transform).__name__}")

    pairs = []
    for g in groups:
        if len(g) == 2:
            pairs.append((g[0], g[1]))
        elif len(g) == 1:
            pairs.append((None, g[0]))
        else:
            raise ValueError("each layer must be [permutation?, coupling]")
    return pairs


def can_fuse_nsf(flow) -> bool:
    """True if :func:`fuse_nsf` accepts this flow."""
    try:
        _extract(flow, jnp.float32)
        return True
    except (ValueError, AttributeError):
        return False


def _extract(flow, dtype, fold_wh_scale=True):
    """Re-lay a qualifying flow's weights for the kernel. With
    ``fold_wh_scale=False`` the softmax 1/sqrt(hidden) width/height rescale
    is NOT folded into the final-layer weights — the kernel applies it via
    ``wh_scale`` instead, keeping the kernel-layout parameters pure
    transposes/permutations of the model's own (so an elementwise optimizer
    like Adam follows the identical trajectory — the fused-training
    requirement, ops/pallas/nsf_train.py)."""
    from nflows_tpu.distributions.normal import StandardNormal
    from nflows_tpu.nn.nets.resnet import ResidualNet
    from nflows_tpu.transforms.coupling import (
        AdditiveCouplingTransform,
        AffineCouplingTransform,
        PiecewiseCubicCouplingTransform,
        PiecewiseLinearCouplingTransform,
        PiecewiseLinearRationalCouplingTransform,
        PiecewiseQuadraticCouplingTransform,
        PiecewiseRationalQuadraticCouplingTransform,
        _default_scale_activation,
        _general_scale_activation,
    )
    from nflows_tpu.transforms.permutations import Permutation

    fusable = (PiecewiseRationalQuadraticCouplingTransform,
               PiecewiseLinearRationalCouplingTransform,
               PiecewiseLinearCouplingTransform,
               PiecewiseQuadraticCouplingTransform,
               PiecewiseCubicCouplingTransform,
               AffineCouplingTransform)  # Additive subclasses Affine

    if not isinstance(flow.distribution, StandardNormal):
        raise ValueError("fused path requires a StandardNormal base")
    # cheap structural pre-validation BEFORE any host transfer, so
    # non-qualifying flows (e.g. serving's auto-probe trying NSF on a
    # MAF) fail in microseconds instead of after a device_get
    pre = _layer_groups(flow.transform)
    if not pre:
        raise ValueError("empty transform chain")
    for perm, cpl in pre:
        if perm is not None and not isinstance(perm, Permutation):
            raise ValueError("layer must start with a feature Permutation")
        if not isinstance(cpl, fusable):
            raise ValueError(
                "only spline (rq/lrs/linear/quadratic/cubic) and "
                "affine/additive couplings are fused")
    # ONE pipelined device->host transfer up front: extraction reads ~7
    # arrays per layer, and per-leaf np.asarray round-trips are ruinously
    # slow through a remote-TPU tunnel (minutes for a 10-layer flow)
    flow = jax.device_get(flow)
    pairs = _layer_groups(flow.transform)

    layer_indices = []
    w0s, b0s, wbs, bbs, wfs, bfs = [], [], [], [], [], []
    wc0s, wcbs, bcbs = [], [], []
    ref_cfg = None
    for perm, cpl in pairs:
        if perm is not None and (not isinstance(perm, Permutation)
                                 or perm.dim != 1):
            raise ValueError("layer must start with a feature Permutation")
        scale_act = None
        if isinstance(cpl, PiecewiseRationalQuadraticCouplingTransform):
            spline = "rq"
        elif isinstance(cpl, PiecewiseLinearRationalCouplingTransform):
            spline = "lrs"
        elif isinstance(cpl, PiecewiseLinearCouplingTransform):
            spline = "linear"
        elif isinstance(cpl, PiecewiseQuadraticCouplingTransform):
            spline = "quadratic"
        elif isinstance(cpl, PiecewiseCubicCouplingTransform):
            spline = "cubic"
        elif isinstance(cpl, AdditiveCouplingTransform):
            spline = "additive"
            scale_act = "none"
        elif isinstance(cpl, AffineCouplingTransform):
            spline = "affine"
            if cpl.scale_activation is _default_scale_activation:
                scale_act = "default"
            elif cpl.scale_activation is _general_scale_activation:
                scale_act = "general"
            else:
                raise ValueError(
                    "only the DEFAULT/GENERAL scale activations are fused")
        else:
            raise ValueError(
                "only spline (rq/lrs/linear/quadratic/cubic) and "
                "affine/additive couplings are fused")
        if spline not in ("affine", "additive") and cpl.tails != "linear":
            raise ValueError("fused path requires tails='linear'")
        if cpl.unconditional_transform is not None:
            raise ValueError("unconditional_transform not supported")
        net = cpl.transform_net
        if not isinstance(net, ResidualNet):
            raise ValueError("conditioner must be a ResidualNet")
        for blk in net.blocks:
            if blk.batch_norm_0 is not None or blk.dropout.rate != 0.0:
                raise ValueError("batch-norm/dropout conditioners not fused")
            if blk.activation is not jax.nn.relu:
                raise ValueError("fused conditioner requires relu activation")

        T = cpl.num_transform_features
        H = net.hidden_features
        if spline in ("affine", "additive"):
            K = 0
            M = 2 if spline == "affine" else 1
            spline_cfg = (None, None, None, None, None)
        elif spline == "linear":
            K = cpl.num_bins
            M = K
            spline_cfg = (cpl.tail_bound, None, None, None, None)
        elif spline in ("quadratic", "cubic"):
            K = cpl.num_bins
            M = (2 * K - 1) if spline == "quadratic" else (2 * K + 2)
            spline_cfg = (cpl.tail_bound, cpl.min_bin_width,
                          cpl.min_bin_height, None, None)
        else:
            K = cpl.num_bins
            M = (3 * K - 1) if spline == "rq" else (4 * K - 1)
            spline_cfg = (cpl.tail_bound, cpl.min_bin_width,
                          cpl.min_bin_height, cpl.min_derivative,
                          getattr(cpl, "min_lambda", None))
        cfg = (spline, scale_act, K, T, cpl.num_identity_features, H,
               len(net.blocks)) + spline_cfg + (net.context_features,)
        if ref_cfg is None:
            ref_cfg = cfg
        elif cfg != ref_cfg:
            raise ValueError("layers must be homogeneous to fuse")

        p = (np.arange(cpl.features) if perm is None
             else np.asarray(perm.permutation))
        id_idx = np.asarray(cpl.identity_features)
        tr_idx = np.asarray(cpl.transform_features)
        merge_fwd = np.argsort(np.concatenate([id_idx, tr_idx]))
        inv_p = np.argsort(p)
        merge_inv = merge_fwd[inv_p]
        layer_indices.append(NSFLayerIndices(
            id_rows=tuple(int(i) for i in p[id_idx]),
            tr_rows=tuple(int(i) for i in p[tr_idx]),
            merge_fwd=tuple(int(i) for i in merge_fwd),
            id_idx=tuple(int(i) for i in id_idx),
            tr_idx=tuple(int(i) for i in tr_idx),
            merge_inv=tuple(int(i) for i in merge_inv),
        ))

        # initial layer runs on [inputs ‖ context] (resnet.py:152): split
        # the concat weight's rows into input and context parts
        Tid = cpl.num_identity_features
        Cf = net.context_features
        w_init = np.asarray(net.initial_layer.weight)         # [Tid(+C), H]
        w0s.append(w_init[:Tid].T)                            # [H, Tid]
        b0s.append(np.asarray(net.initial_layer.bias)[:, None])
        if Cf is not None:
            wc0s.append(w_init[Tid:].T)                       # [H, C]
        layer_wb, layer_bb = [], []
        layer_wc, layer_bc = [], []
        for blk in net.blocks:
            for lin in (blk.linear_0, blk.linear_1):
                layer_wb.append(np.asarray(lin.weight).T)     # [H, H]
                layer_bb.append(np.asarray(lin.bias)[:, None])
            if Cf is not None:
                layer_wc.append(np.asarray(blk.context_layer.weight).T)
                layer_bc.append(np.asarray(blk.context_layer.bias)[:, None])
        wbs.append(np.stack(layer_wb))
        bbs.append(np.stack(layer_bb))
        if Cf is not None:
            wcbs.append(np.stack(layer_wc))
            bcbs.append(np.stack(layer_bc))

        # final layer: reorder columns K-major (new col j*T+t = old t*M+j)
        # and fold the softmax 1/sqrt(H) scale into width/height params
        # (reference coupling.py:554-563; the LRS lambda/derivative params
        # are unscaled, like the RQ derivatives)
        wf = np.asarray(net.final_layer.weight)               # [H, T*M]
        bf = np.asarray(net.final_layer.bias)                 # [T*M]
        if spline in ("affine", "additive"):
            # affine params are already param-major ([shift(T) ‖ scale(T)],
            # coupling.py:178-181) and have no softmax rescale
            order = np.arange(T * M)
        else:
            order = np.array([t * M + j for j in range(M) for t in range(T)])
        wf = wf[:, order]
        bf = bf[order]
        # per-family softmax 1/sqrt(H) rescale prefix (K-major rows):
        # rq/lrs/cubic rescale widths+heights only; quadratic rescales ALL
        # its params (its _softmax_rescale covers both groups,
        # coupling.py:332-334); linear rescales nothing
        n_scaled = {"rq": 2 * K * T, "lrs": 2 * K * T, "cubic": 2 * K * T,
                    "quadratic": T * M}.get(spline, 0)
        if fold_wh_scale and n_scaled:
            scale = np.ones(T * M, dtype=wf.dtype)
            scale[:n_scaled] = 1.0 / np.sqrt(H)
            wf = wf * scale[None, :]
            bf = bf * scale
        wfs.append(wf.T)                                      # [TM, H]
        bfs.append(bf[:, None])

    (spline, scale_act, K, T, Tid, H, num_blocks, tail_bound, mbw, mbh, md,
     ml, context_features) = ref_cfg
    weights = dict(
        w0=jnp.asarray(np.stack(w0s), dtype=dtype),
        b0=jnp.asarray(np.stack(b0s), dtype=jnp.float32),
        wb=jnp.asarray(np.stack(wbs), dtype=dtype),
        bb=jnp.asarray(np.stack(bbs), dtype=jnp.float32),
        wf=jnp.asarray(np.stack(wfs), dtype=dtype),
        bf=jnp.asarray(np.stack(bfs), dtype=jnp.float32),
    )
    if context_features is not None:
        weights.update(
            wc0=jnp.asarray(np.stack(wc0s), dtype=dtype),
            wcb=jnp.asarray(np.stack(wcbs), dtype=dtype),
            bcb=jnp.asarray(np.stack(bcbs), dtype=jnp.float32),
        )
    if spline in ("affine", "additive"):
        static = dict(num_blocks=num_blocks, spline=spline,
                      scale_act=scale_act)
    elif spline == "linear":
        static = dict(num_bins=K, num_blocks=num_blocks, spline=spline,
                      tail_bound=float(tail_bound))
    elif spline in ("quadratic", "cubic"):
        static = dict(num_bins=K, num_blocks=num_blocks, spline=spline,
                      tail_bound=float(tail_bound),
                      min_bin_width=float(mbw), min_bin_height=float(mbh))
    else:
        static = dict(
            num_bins=K, num_blocks=num_blocks, tail_bound=float(tail_bound),
            min_bin_width=float(mbw), min_bin_height=float(mbh),
            min_derivative=float(md), spline=spline,
            min_lambda=None if ml is None else float(ml),
        )
    features = Tid + T
    return layer_indices, weights, static, features, context_features


class FusedNSF(FusedFlowView):
    """Megakernel-backed inference view of a tabular coupling flow (any
    spline family — RQ/LRS/linear/quadratic/cubic — or affine/additive).

    ``forward``/``inverse`` have the Transform contract; ``log_prob``,
    ``sample`` and ``sample_and_log_prob`` the Distribution contract.
    Conditional flows are supported since round 3: the embedding net runs
    once outside the kernel (plain XLA), the embedded per-sample context
    rides the lanes in VMEM and each ResidualNet block's context GLU is
    one extra stationary GEMM (reference resnet.py:51). Build with
    :func:`fuse_nsf`.
    """

    def __init__(self, flow, dtype=jnp.bfloat16, lanes: int = LANES_DEFAULT,
                 interpret: bool = False):
        (self._indices, self._weights, self._static,
         self.features, self.context_features) = _extract(flow, dtype)
        # embedding net applied OUTSIDE the kernel (arbitrary XLA module;
        # None = identity, matching Flow._embed)
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
                ctx_kw = dict(ctx_t=ctx_t, wc0=w["wc0"], wcb=w["wcb"],
                              bcb=w["bcb"])
            return nsf_flow_kernel_call(
                x_t, w["w0"], w["b0"], w["wb"], w["bb"], w["wf"], w["bf"],
                self._indices, inverse=inverse, lanes=self._lanes,
                interpret=self._interpret, **ctx_kw, **self._static,
            )

        self._run_fwd = jax.jit(lambda x_t, ctx_t: run(x_t, ctx_t, False))
        self._run_inv = jax.jit(lambda x_t, ctx_t: run(x_t, ctx_t, True))


def fuse_nsf(flow, dtype=jnp.bfloat16, lanes: int = LANES_DEFAULT,
             interpret: Optional[bool] = None) -> FusedNSF:
    """Build the fused inference view of ``flow``.

    ``dtype`` sets the conditioner GEMM precision (bf16 default — the
    training configuration; pass ``jnp.float32`` for full precision at
    ~2x the MXU cost). ``interpret=None`` auto-selects the Pallas
    interpreter off-TPU so the same code runs in CPU tests.
    """
    if interpret is None:
        from nflows_tpu.ops.pallas.rq_spline import pallas_available
        interpret = not pallas_available()
    return FusedNSF(flow, dtype=dtype, lanes=lanes, interpret=interpret)
