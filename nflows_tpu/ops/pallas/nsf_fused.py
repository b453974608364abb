"""Fused NSF inference path: extract a tabular RQ-NSF flow into the
whole-flow Pallas kernel (nsf_flow_kernel.py) and expose sample /
log_prob / sample_and_log_prob at megakernel speed.

``fuse_nsf(flow)`` validates the model structure (L homogeneous
[Permutation, PiecewiseRationalQuadraticCouplingTransform(ResidualNet)]
layers, tails='linear', relu, no context/dropout/batch-norm), re-lays the
weights out for the kernel — transposed for the samples-on-lanes layout,
final-layer columns permuted K-major, the softmax 1/sqrt(hidden) scale
folded in (reference coupling.py:554-563) — and returns a
:class:`FusedNSF` whose methods run the whole transform chain as ONE
``pallas_call``.

This is an inference object: no gradients flow through it (training uses
the autodiff'd XLA chain; this exists to win the sampling/eval
throughput race — see benchmarks/bench_fused_nsf.py and BASELINE.md).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

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
    """Yield (permutation, coupling) pairs from the flow's transform."""
    from nflows_tpu.transforms.base import CompositeTransform
    from nflows_tpu.transforms.stacked import StackedTransform

    if isinstance(transform, StackedTransform):
        groups = transform.layers()
    elif isinstance(transform, CompositeTransform):
        ts = transform.transforms
        if len(ts) % 2:
            raise ValueError("expected [permutation, coupling] pairs")
        groups = [CompositeTransform(ts[i:i + 2]) for i in range(0, len(ts), 2)]
    else:
        raise ValueError(f"unsupported transform type {type(transform).__name__}")

    pairs = []
    for g in groups:
        if len(g.transforms) != 2:
            raise ValueError("each layer must be [permutation, coupling]")
        pairs.append((g.transforms[0], g.transforms[1]))
    return pairs


def can_fuse_nsf(flow) -> bool:
    """True if :func:`fuse_nsf` accepts this flow."""
    try:
        _extract(flow, jnp.float32)
        return True
    except (ValueError, AttributeError):
        return False


def _extract(flow, dtype):
    from nflows_tpu.distributions.normal import StandardNormal
    from nflows_tpu.nn.nets.resnet import ResidualNet
    from nflows_tpu.transforms.coupling import (
        PiecewiseLinearRationalCouplingTransform,
        PiecewiseRationalQuadraticCouplingTransform,
    )
    from nflows_tpu.transforms.permutations import Permutation

    if not isinstance(flow.distribution, StandardNormal):
        raise ValueError("fused path requires a StandardNormal base")
    # cheap structural pre-validation BEFORE any host transfer, so
    # non-qualifying flows (e.g. serving's auto-probe trying NSF on a
    # MAF) fail in microseconds instead of after a device_get
    pre = _layer_groups(flow.transform)
    if not pre:
        raise ValueError("empty transform chain")
    for perm, cpl in pre:
        if not isinstance(perm, Permutation):
            raise ValueError("layer must start with a feature Permutation")
        if not isinstance(cpl, (PiecewiseRationalQuadraticCouplingTransform,
                                PiecewiseLinearRationalCouplingTransform)):
            raise ValueError("only RQ/LRS-spline couplings are fused")
    # ONE pipelined device->host transfer up front: extraction reads ~7
    # arrays per layer, and per-leaf np.asarray round-trips are ruinously
    # slow through a remote-TPU tunnel (minutes for a 10-layer flow)
    flow = jax.device_get(flow)
    pairs = _layer_groups(flow.transform)

    layer_indices = []
    w0s, b0s, wbs, bbs, wfs, bfs = [], [], [], [], [], []
    ref_cfg = None
    for perm, cpl in pairs:
        if not isinstance(perm, Permutation) or perm.dim != 1:
            raise ValueError("layer must start with a feature Permutation")
        if isinstance(cpl, PiecewiseRationalQuadraticCouplingTransform):
            spline = "rq"
        elif isinstance(cpl, PiecewiseLinearRationalCouplingTransform):
            spline = "lrs"
        else:
            raise ValueError("only RQ/LRS-spline couplings are fused")
        if cpl.tails != "linear":
            raise ValueError("fused path requires tails='linear'")
        if cpl.unconditional_transform is not None:
            raise ValueError("unconditional_transform not supported")
        net = cpl.transform_net
        if not isinstance(net, ResidualNet):
            raise ValueError("conditioner must be a ResidualNet")
        if net.context_features is not None:
            raise ValueError("context not supported in the fused path")
        for blk in net.blocks:
            if blk.batch_norm_0 is not None or blk.dropout.rate != 0.0:
                raise ValueError("batch-norm/dropout conditioners not fused")
            if blk.activation is not jax.nn.relu:
                raise ValueError("fused conditioner requires relu activation")

        K = cpl.num_bins
        T = cpl.num_transform_features
        M = (3 * K - 1) if spline == "rq" else (4 * K - 1)
        H = net.hidden_features
        cfg = (spline, K, T, cpl.num_identity_features, H, len(net.blocks),
               cpl.tail_bound, cpl.min_bin_width, cpl.min_bin_height,
               cpl.min_derivative,
               getattr(cpl, "min_lambda", None))
        if ref_cfg is None:
            ref_cfg = cfg
        elif cfg != ref_cfg:
            raise ValueError("layers must be homogeneous to fuse")

        p = np.asarray(perm.permutation)
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

        w0s.append(np.asarray(net.initial_layer.weight).T)    # [H, Tid]
        b0s.append(np.asarray(net.initial_layer.bias)[:, None])
        layer_wb, layer_bb = [], []
        for blk in net.blocks:
            for lin in (blk.linear_0, blk.linear_1):
                layer_wb.append(np.asarray(lin.weight).T)     # [H, H]
                layer_bb.append(np.asarray(lin.bias)[:, None])
        wbs.append(np.stack(layer_wb))
        bbs.append(np.stack(layer_bb))

        # final layer: reorder columns K-major (new col j*T+t = old t*M+j)
        # and fold the softmax 1/sqrt(H) scale into width/height params
        # (reference coupling.py:554-563; the LRS lambda/derivative params
        # are unscaled, like the RQ derivatives)
        wf = np.asarray(net.final_layer.weight)               # [H, T*M]
        bf = np.asarray(net.final_layer.bias)                 # [T*M]
        order = np.array([t * M + j for j in range(M) for t in range(T)])
        scale = np.ones(T * M, dtype=wf.dtype)
        scale[: 2 * K * T] = 1.0 / np.sqrt(H)                 # widths+heights
        wf = wf[:, order] * scale[None, :]
        bf = bf[order] * scale
        wfs.append(wf.T)                                      # [TM, H]
        bfs.append(bf[:, None])

    spline, K, T, Tid, H, num_blocks, tail_bound, mbw, mbh, md, ml = ref_cfg
    weights = dict(
        w0=jnp.asarray(np.stack(w0s), dtype=dtype),
        b0=jnp.asarray(np.stack(b0s), dtype=jnp.float32),
        wb=jnp.asarray(np.stack(wbs), dtype=dtype),
        bb=jnp.asarray(np.stack(bbs), dtype=jnp.float32),
        wf=jnp.asarray(np.stack(wfs), dtype=dtype),
        bf=jnp.asarray(np.stack(bfs), dtype=jnp.float32),
    )
    static = dict(
        num_bins=K, num_blocks=num_blocks, tail_bound=float(tail_bound),
        min_bin_width=float(mbw), min_bin_height=float(mbh),
        min_derivative=float(md), spline=spline,
        min_lambda=None if ml is None else float(ml),
    )
    features = Tid + T
    return layer_indices, weights, static, features


class FusedNSF:
    """Megakernel-backed inference view of a tabular NSF flow (RQ or
    linear-rational spline family).

    ``forward``/``inverse`` have the Transform contract; ``log_prob``,
    ``sample`` and ``sample_and_log_prob`` the Distribution contract
    (context-free). Build with :func:`fuse_nsf`.
    """

    def __init__(self, flow, dtype=jnp.bfloat16, lanes: int = LANES_DEFAULT,
                 interpret: bool = False):
        (self._indices, self._weights, self._static,
         self.features) = _extract(flow, dtype)
        self._lanes = lanes
        self._interpret = interpret
        self._build_runners()

    def _build_runners(self):
        def run(x_t, inverse):
            w = self._weights
            return nsf_flow_kernel_call(
                x_t, w["w0"], w["b0"], w["wb"], w["bb"], w["wf"], w["bf"],
                self._indices, inverse=inverse, lanes=self._lanes,
                interpret=self._interpret, **self._static,
            )

        self._run_fwd = jax.jit(lambda x_t: run(x_t, False))
        self._run_inv = jax.jit(lambda x_t: run(x_t, True))

    def with_lanes(self, lanes: int) -> "FusedNSF":
        """A view of the same extracted weights with a different lane tile
        (no re-extraction/host transfer). Ragged batches pad up to one lane
        tile, so size the tile to the request shape."""
        import copy
        view = copy.copy(self)
        view._lanes = lanes
        view._build_runners()
        return view

    # -- transform contract ------------------------------------------------

    def _apply(self, inputs, inverse):
        n = inputs.shape[0]
        if inputs.ndim != 2 or inputs.shape[1] != self.features:
            raise ValueError(
                f"expected [N, {self.features}] inputs, got {inputs.shape}")
        pad = (-n) % self._lanes
        x_t = jnp.asarray(inputs, jnp.float32).T
        if pad:
            x_t = jnp.pad(x_t, ((0, 0), (0, pad)))
        run = self._run_inv if inverse else self._run_fwd
        y_t, lad = run(x_t)
        return y_t[:, :n].T, lad[0, :n]

    def forward(self, inputs, context=None):
        if context is not None:
            raise ValueError("fused path is context-free")
        return self._apply(inputs, inverse=False)

    def inverse(self, inputs, context=None):
        if context is not None:
            raise ValueError("fused path is context-free")
        return self._apply(inputs, inverse=True)

    # -- distribution contract ---------------------------------------------

    def log_prob(self, inputs, context=None):
        noise, logabsdet = self.forward(inputs, context)
        log_base = -0.5 * jnp.sum(noise ** 2, axis=1) \
            - 0.5 * self.features * np.log(2 * np.pi)
        return log_base + logabsdet

    def sample(self, key, num_samples, context=None):
        if context is not None:
            raise ValueError("fused path is context-free")
        noise = jax.random.normal(key, (num_samples, self.features))
        samples, _ = self.inverse(noise)
        return samples

    def sample_and_log_prob(self, key, num_samples, context=None):
        if context is not None:
            raise ValueError("fused path is context-free")
        noise = jax.random.normal(key, (num_samples, self.features))
        samples, logabsdet = self.inverse(noise)
        log_base = -0.5 * jnp.sum(noise ** 2, axis=1) \
            - 0.5 * self.features * np.log(2 * np.pi)
        return samples, log_base - logabsdet


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
