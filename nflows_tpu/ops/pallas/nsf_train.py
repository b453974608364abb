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

Reference math being differentiated:
nflows/transforms/splines/rational_quadratic.py:132-181 (forward branch)
through nflows/transforms/coupling.py:502-582; the conditioner is
nflows/nn/nets/resnet.py:55-100.

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

from nflows_tpu.ops.pallas.nsf_flow_kernel import (
    _SPLINES_TR,
    _take_rows,
    nsf_flow_kernel_call,
)

__all__ = ["FusedNSFTrainer", "nsf_train_vjp_call"]


def _dot_f32(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _conditioner_vals(identity, ws, num_blocks):
    """ResidualNet forward on weight VALUES (differentiable w.r.t. them).
    ``ws`` is the flat per-layer tuple (w0, b0, wb_0..wb_{2nb-1},
    bb_0..bb_{2nb-1}, wf, bf), every matrix pre-transposed for the
    samples-on-lanes layout."""
    w0, b0 = ws[0], ws[1]
    nb = 2 * num_blocks
    wbs = ws[2:2 + nb]
    bbs = ws[2 + nb:2 + 2 * nb]
    wf, bf = ws[-2], ws[-1]
    h = _dot_f32(w0, identity) + b0
    for j in range(num_blocks):
        t = jnp.maximum(h, 0.0)
        t = _dot_f32(wbs[2 * j], t) + bbs[2 * j]
        t = jnp.maximum(t, 0.0)
        t = _dot_f32(wbs[2 * j + 1], t) + bbs[2 * j + 1]
        h = h + t
    return _dot_f32(wf, h) + bf


def _make_layer_fn(li, spline, num_bins, num_blocks, wh_scale, spline_kw):
    """The differentiable forward of ONE [permutation, coupling] layer:
    (x [D, R], *weights) -> (y [D, R], lad_sum [1, R])."""
    T = len(li.tr_idx)
    KT2 = 2 * num_bins * T

    def layer_fn(x_full, *ws):
        identity = _take_rows(x_full, li.id_rows)
        transform = _take_rows(x_full, li.tr_rows)
        P = _conditioner_vals(identity, ws, num_blocks)
        P = jnp.concatenate([P[:KT2] * wh_scale, P[KT2:]], axis=0)
        out, lad = _SPLINES_TR[spline](
            transform, P, num_bins=num_bins, T=T, inverse=False, **spline_kw)
        y = _take_rows(jnp.concatenate([identity, out], axis=0), li.merge_fwd)
        return y, jnp.sum(lad, axis=0, keepdims=True)

    return layer_fn


def _slice_layer_weights(l, w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
                         num_blocks, H, TM):
    """Read layer l's weight VALUES out of the flattened VMEM scratch."""
    nb = 2 * num_blocks

    def rows(ref, i, r):
        return ref[i * r:(i + 1) * r, :]

    ws = [rows(w0_v, l, H), rows(b0_v, l, H)]
    ws += [rows(wb_v, l * nb + j, H) for j in range(nb)]
    ws += [rows(bb_v, l * nb + j, H) for j in range(nb)]
    ws += [rows(wf_v, l, TM), rows(bf_v, l, TM)]
    return tuple(ws)


def _bwd_kernel(x_ref, gy_ref, glad_ref,
                w0_hbm, b0_hbm, wb_hbm, bb_hbm, wf_hbm, bf_hbm,
                gx_ref, gw0_ref, gb0_ref, gwb_ref, gbb_ref, gwf_ref, gbf_ref,
                w0_v, b0_v, wb_v, bb_v, wf_v, bf_v, dma_sems, *,
                layer_indices, num_bins, num_blocks, H, TM, spline,
                spline_kw, wh_scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @pl.when(pl.program_id(0) == 0)
    def _init():
        pairs = ((w0_hbm, w0_v), (b0_hbm, b0_v), (wb_hbm, wb_v),
                 (bb_hbm, bb_v), (wf_hbm, wf_v), (bf_hbm, bf_v))
        dmas = [
            pltpu.make_async_copy(src, dst, dma_sems.at[i])
            for i, (src, dst) in enumerate(pairs)
        ]
        for dma in dmas:
            dma.start()
        # zero the cross-tile gradient accumulators while the DMAs fly
        for ref in (gw0_ref, gb0_ref, gwb_ref, gbb_ref, gwf_ref, gbf_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        for dma in dmas:
            dma.wait()

    L = len(layer_indices)
    layer_fns = [
        _make_layer_fn(layer_indices[l], spline, num_bins, num_blocks,
                       wh_scale, spline_kw)
        for l in range(L)
    ]
    all_ws = [
        _slice_layer_weights(l, w0_v, b0_v, wb_v, bb_v, wf_v, bf_v,
                             num_blocks, H, TM)
        for l in range(L)
    ]

    # forward recompute, keeping only the per-layer INPUTS ([D, R] each —
    # the cheap residuals; conditioner activations are re-derived inside
    # each layer's vjp)
    x = x_ref[...].astype(jnp.float32)
    xs = []
    for l in range(L):
        xs.append(x)
        x, _ = layer_fns[l](x, *all_ws[l])

    # backward sweep: vjp of each traced layer, accumulating weight grads
    gx = gy_ref[...].astype(jnp.float32)
    glad = glad_ref[...].astype(jnp.float32)
    nb = 2 * num_blocks
    for l in range(L - 1, -1, -1):
        _, vjp = jax.vjp(layer_fns[l], xs[l], *all_ws[l])
        gx, *gws = vjp((gx, glad))
        gw0_ref[l * H:(l + 1) * H, :] += gws[0]
        gb0_ref[l * H:(l + 1) * H, :] += gws[1]
        for j in range(nb):
            r = (l * nb + j) * H
            gwb_ref[r:r + H, :] += gws[2 + j]
            gbb_ref[r:r + H, :] += gws[2 + nb + j]
        gwf_ref[l * TM:(l + 1) * TM, :] += gws[-2]
        gbf_ref[l * TM:(l + 1) * TM, :] += gws[-1]

    gx_ref[...] = gx


def _bwd_call(x_t, gy_t, glad, w0, b0, wb, bb, wf, bf, *,
              layer_indices, num_bins, num_blocks, spline, spline_kw,
              wh_scale, lanes, interpret):
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

    kernel = functools.partial(
        _bwd_kernel,
        layer_indices=tuple(layer_indices),
        num_bins=num_bins, num_blocks=num_blocks, H=H, TM=TM,
        spline=spline, spline_kw=spline_kw, wh_scale=wh_scale,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tile = lambda shape: pl.BlockSpec(  # noqa: E731
        (shape, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    acc = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)

    gx, gw0, gb0, gwb, gbb, gwf, gbf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(D), tile(D), tile(1), hbm, hbm, hbm, hbm, hbm, hbm],
        out_specs=[
            tile(D),
            acc(*w0f.shape), acc(*b0f.shape), acc(*wbf.shape),
            acc(*bbf.shape), acc(*wff.shape), acc(*bff.shape),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, N), jnp.float32),
            jax.ShapeDtypeStruct(w0f.shape, jnp.float32),
            jax.ShapeDtypeStruct(b0f.shape, jnp.float32),
            jax.ShapeDtypeStruct(wbf.shape, jnp.float32),
            jax.ShapeDtypeStruct(bbf.shape, jnp.float32),
            jax.ShapeDtypeStruct(wff.shape, jnp.float32),
            jax.ShapeDtypeStruct(bff.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(w0f.shape, jnp.float32),
            pltpu.VMEM(b0f.shape, jnp.float32),
            pltpu.VMEM(wbf.shape, jnp.float32),
            pltpu.VMEM(bbf.shape, jnp.float32),
            pltpu.VMEM(wff.shape, jnp.float32),
            pltpu.VMEM(bff.shape, jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_t, gy_t, glad, w0f, b0f, wbf, bbf, wff, bff)
    return (gx,
            gw0.reshape(w0.shape), gb0.reshape(b0.shape),
            gwb.reshape(wb.shape), gbb.reshape(bb.shape),
            gwf.reshape(wf.shape), gbf.reshape(bf.shape))


def nsf_train_vjp_call(indices, static, lanes, interpret):
    """Build the custom_vjp'd fused forward for training.

    Returns ``apply(weights_dict, x_t) -> (y_t [D, N], lad [1, N])`` whose
    backward runs the recompute-in-kernel Pallas pass. ``weights_dict``
    holds fp32 kernel-layout stacks (w0/b0/wb/bb/wf/bf) extracted with
    ``fold_wh_scale=False``.
    """
    from nflows_tpu import config

    spline_kw = dict(
        tail_bound=static["tail_bound"],
        min_bin_width=static["min_bin_width"],
        min_bin_height=static["min_bin_height"],
        min_derivative=static["min_derivative"],
    )
    if static["spline"] == "lrs":
        spline_kw["min_lambda"] = static["min_lambda"]
    # resolve the packed-select choice ONCE at build so the forward kernel
    # and the recompute-in-kernel backward always run the same spline form
    packed = (config.packed_spline_select()
              and f"{static['spline']}_packed" in _SPLINES_TR)
    bwd_spline = (f"{static['spline']}_packed" if packed
                  else static["spline"])
    common = dict(
        layer_indices=tuple(indices),
        num_bins=static["num_bins"],
        num_blocks=static["num_blocks"],
        spline=bwd_spline,
        spline_kw=spline_kw,
        lanes=lanes,
        interpret=interpret,
    )

    @jax.custom_vjp
    def apply(weights, x_t):
        H = weights["w0"].shape[1]
        return nsf_flow_kernel_call(
            x_t, weights["w0"], weights["b0"], weights["wb"], weights["bb"],
            weights["wf"], weights["bf"], tuple(indices), inverse=False,
            num_bins=static["num_bins"], num_blocks=static["num_blocks"],
            tail_bound=static["tail_bound"],
            min_bin_width=static["min_bin_width"],
            min_bin_height=static["min_bin_height"],
            min_derivative=static["min_derivative"],
            spline=static["spline"], min_lambda=static["min_lambda"],
            wh_scale=1.0 / math.sqrt(H), lanes=lanes, interpret=interpret,
            packed_select=packed,
        )

    def fwd(weights, x_t):
        return apply(weights, x_t), (weights, x_t)

    def bwd(res, cot):
        weights, x_t = res
        gy_t, glad = cot
        H = weights["w0"].shape[1]
        gx, gw0, gb0, gwb, gbb, gwf, gbf = _bwd_call(
            x_t, gy_t, glad,
            weights["w0"], weights["b0"], weights["wb"], weights["bb"],
            weights["wf"], weights["bf"],
            wh_scale=1.0 / math.sqrt(H), **common,
        )
        gweights = dict(w0=gw0, b0=gb0, wb=gwb, bb=gbb, wf=gwf, bf=gbf)
        return gweights, gx

    apply.defvjp(fwd, bwd)
    return apply


class FusedNSFTrainer:
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
         context_features) = _extract(flow, jnp.float32,
                                      fold_wh_scale=False)
        if context_features is not None:
            raise ValueError(
                "fused training is context-free in this version; train "
                "conditional flows on the XLA chain")
        if self._static["spline"] not in ("rq", "lrs"):
            raise ValueError(
                "fused training covers the spline families (rq/lrs); "
                "affine/additive flows train on the XLA chain")
        self.weights = weights
        self._flow_template = flow
        self.batch_size = int(batch_size)
        if self.batch_size % 128:
            raise ValueError(
                f"batch_size={batch_size} must be a multiple of 128 (the "
                "kernel lane width)")
        # lane tile: the largest multiple-of-128 divisor of batch_size that
        # fits one grid step (<= 1024); the grid covers the rest
        self._lanes = max(c for c in range(128, 1025, 128)
                          if self.batch_size % c == 0)
        self._interpret = interpret
        self._apply = nsf_train_vjp_call(
            self._indices, self._static, self._lanes, interpret)

    # -- training ----------------------------------------------------------

    def loss_fn(self, weights, batch_t):
        """-mean log_prob; ``batch_t`` is [D, N] (samples on lanes)."""
        y_t, lad = self._apply(weights, batch_t)
        log_z = 0.5 * self.features * math.log(2.0 * math.pi)
        lp = -0.5 * jnp.sum(y_t * y_t, axis=0) - log_z + lad[0]
        return -jnp.mean(lp)

    def init_opt(self, optimizer):
        return optimizer.init(self.weights)

    def make_train_step(self, optimizer, donate=True):
        import optax

        def step(weights, opt_state, batch):
            batch_t = jnp.asarray(batch, jnp.float32).T
            loss, grads = jax.value_and_grad(self.loss_fn)(weights, batch_t)
            updates, opt_state = optimizer.update(grads, opt_state, weights)
            return optax.apply_updates(weights, updates), opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def make_dp_train_step(self, optimizer, mesh, data_axis="data",
                           donate=True):
        """Data-parallel fused training over a ``jax.sharding.Mesh``: each
        device runs the forward+backward megakernels on its batch shard
        (``shard_map``), gradients and loss are ``pmean``'d over ICI, and
        the (replicated) optimizer update is applied identically
        everywhere — the fused-trainer analogue of
        ``parallel.train.make_sharded_train_step``. ``batch`` is the
        GLOBAL [N, D] batch, sharded on its leading axis; weights and
        opt_state are replicated. Per-device batch must be a multiple of
        the 128-lane kernel tile.
        """
        import optax
        from jax.sharding import PartitionSpec
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        n = mesh.shape[data_axis]
        per_dev = self.batch_size // n
        if self.batch_size % n or per_dev % 128:
            raise ValueError(
                f"global batch {self.batch_size} over {n} '{data_axis}' "
                "devices must give a per-device batch that is a multiple "
                "of 128")
        lanes = max(c for c in range(128, 1025, 128) if per_dev % c == 0)
        apply_local = nsf_train_vjp_call(
            self._indices, self._static, lanes, self._interpret)
        log_z = 0.5 * self.features * math.log(2.0 * math.pi)

        def local_loss(weights, batch_t):
            y_t, lad = apply_local(weights, batch_t)
            lp = -0.5 * jnp.sum(y_t * y_t, axis=0) - log_z + lad[0]
            return -jnp.mean(lp)

        def shard_step(weights, opt_state, batch):
            loss, grads = jax.value_and_grad(local_loss)(
                weights, batch.T)
            # equal shards: global mean = pmean of per-shard means
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            updates, opt_state = optimizer.update(grads, opt_state, weights)
            return optax.apply_updates(weights, updates), opt_state, loss

        P = PartitionSpec
        # pallas_call does not carry the varying-across-mesh (vma) type
        # shard_map's replication checker needs, so disable the check —
        # replication is real here (pmean'd grads, identical updates) and
        # pinned by tests/parallel/test_fused_dp.py
        try:
            sharded = shard_map(
                shard_step, mesh=mesh,
                in_specs=(P(), P(), P(data_axis)),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        except TypeError:  # older jax spells it check_rep
            sharded = shard_map(
                shard_step, mesh=mesh,
                in_specs=(P(), P(), P(data_axis)),
                out_specs=(P(), P(), P()),
                check_rep=False,
            )
        return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())

    def make_scan_train_step(self, optimizer):
        """One dispatch = one ``lax.scan`` over ``batches``' leading axis —
        the same scan-fused loop shape bench.py uses for the XLA path."""
        import optax

        def one(carry, batch):
            weights, opt_state = carry
            batch_t = batch.T
            loss, grads = jax.value_and_grad(self.loss_fn)(weights, batch_t)
            updates, opt_state = optimizer.update(grads, opt_state, weights)
            return (optax.apply_updates(weights, updates), opt_state), loss

        def steps(weights, opt_state, batches):
            (weights, opt_state), losses = jax.lax.scan(
                one, (weights, opt_state), batches)
            return weights, opt_state, losses

        return jax.jit(steps, donate_argnums=(0, 1))

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
        K = self._static["num_bins"]
        new_groups = []
        for l, (perm, cpl) in enumerate(pairs):
            net = cpl.transform_net
            T = cpl.num_transform_features
            M = w["wf"].shape[1] // T
            order = np.array([t * M + j for j in range(M) for t in range(T)])
            inv_order = np.argsort(order)
            blocks = []
            for j, blk in enumerate(net.blocks):
                blocks.append(blk.replace(
                    linear_0=blk.linear_0.replace(
                        weight=jnp.asarray(w["wb"][l, 2 * j].T),
                        bias=jnp.asarray(w["bb"][l, 2 * j, :, 0])),
                    linear_1=blk.linear_1.replace(
                        weight=jnp.asarray(w["wb"][l, 2 * j + 1].T),
                        bias=jnp.asarray(w["bb"][l, 2 * j + 1, :, 0])),
                ))
            net = net.replace(
                initial_layer=net.initial_layer.replace(
                    weight=jnp.asarray(w["w0"][l].T),
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
