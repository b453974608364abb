"""Shared machinery for the fused megakernel trainers.

``FusedTrainerBase`` owns everything that is identical between the
coupling trainer (nsf_train.FusedNSFTrainer) and the AR trainer
(maf_train.FusedMAFTrainer): batch/lane-tile validation, the NLL loss on
the fused apply, and the single-device / scan / data-parallel train
steps. Subclasses provide two hooks:

- ``_build_apply(lanes)`` — the custom_vjp'd fused forward for a given
  lane tile (conditional signature when ``self._has_ctx``);
- ``_fold(weights)`` — the differentiable per-step weight fold applied
  before the kernel (identity for couplings; the MADE mask fold for AR).

Centralizing the step builders exists for a concrete reason: the DP step
builds its own per-shard apply, and a copy-pasted inline loss once let an
IAF subclass silently train the wrong objective through the inherited DP
path (caught in review). Here every step routes through ``self.loss_fn``
or ``self._loss_from_apply`` so a subclass that redefines/forbids the
loss changes every step at once.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["FusedTrainerBase"]


class FusedTrainerBase:
    """Common train-step machinery; see nsf_train/maf_train for usage."""

    # set by subclass __init__: weights, features, context_features,
    # batch_size, _lanes, _interpret, _has_ctx

    # one TPU core's VMEM is 128 MiB; the backward kernel is additionally
    # subject to Mosaic's 100 MiB scoped-vmem default. Budget below both,
    # leaving headroom for double-buffered DMAs and scheduler slack.
    _VMEM_BUDGET = 96 * 1024 * 1024

    def _init_batching(self, batch_size):
        self.batch_size = int(batch_size)
        if self.batch_size % 128:
            raise ValueError(
                f"batch_size={batch_size} must be a multiple of 128 (the "
                "kernel lane width)")
        # lane tile: the largest multiple-of-128 divisor of batch_size
        # (<= 1024) whose backward-kernel VMEM estimate fits the budget;
        # the grid covers the rest
        self._lanes = self._lane_tile(self.batch_size)

    def _lane_tile(self, n):
        fixed = self._fixed_vmem_bytes()
        per_lane = self._lane_vmem_bytes()
        fits = [c for c in range(128, 1025, 128)
                if n % c == 0 and fixed + c * per_lane <= self._VMEM_BUDGET]
        if fits:
            return max(fits)
        # 128 is the floor: below it the kernels cannot tile at all. When
        # even that is estimated well past the PHYSICAL core (not just
        # the soft budget), warn with guidance up front — hidden 512
        # measured 130.5M/128M on v5e (round 5) and dies in the compiler
        # — but still let the compiler have the final word: the estimate
        # is a heuristic (width-ramped, deliberately conservative) and
        # must never falsely block a model that would compile.
        if (not getattr(self, "_interpret", False)
                and fixed + 128 * per_lane > int(1.4 * self._VMEM_BUDGET)):
            import warnings
            warnings.warn(
                "this model is likely too wide for the fused trainer: "
                "the backward kernel is estimated at "
                f"~{(fixed + 128 * per_lane) / 2**20:.0f} MiB of VMEM at "
                "the minimum 128-lane tile (128 MiB/core on v5e; "
                "measured ceiling hidden <= 384). If compilation fails "
                "with a VMEM error, train on the XLA chain "
                "(training.make_train_step) — at this width it is also "
                "the measured throughput winner (BASELINE.md round 5).",
                stacklevel=3)
        return 128

    def _fixed_vmem_bytes(self):
        """Lane-independent VMEM of the backward kernel: the weight scratch
        plus the same-shaped gradient accumulator output blocks."""
        return 2 * sum(w.nbytes for w in self.weights.values())

    def _lane_vmem_bytes(self):
        """Per-lane VMEM of the backward kernel (bytes per batch column).

        The in-kernel ``jax.vjp`` residuals of every layer are live at
        once (Mosaic schedules the recompute chain ahead of the backward
        sweep), so the footprint is ~2x the total matmul-output rows
        across all layers — i.e. the summed leading dims of the weight
        matrices. Measured anchors (flagship NSF, lanes=1024): estimate
        2.5 * 13,490 rows * 4 B = 132 KiB/lane vs 125 KiB/lane observed;
        MAF: 126 KiB vs ~114 KiB observed. WIDE hidden grows
        superlinearly (round-5 hardware anchors: hidden 384 at lanes 256
        estimated 95.8M but exceeded the 128M core, while lanes 128 runs;
        hidden 512 exceeds it even at 128 lanes, 130.5M observed), so the
        multiplier ramps with the conditioner width. Conservative by
        design."""
        rows = sum(
            int(np.prod(w.shape[:-1]))
            for w in self.weights.values()
            if w.ndim >= 2 and w.shape[-1] > 1)
        width = max((w.shape[-1] for w in self.weights.values()
                     if w.ndim >= 2), default=0)
        mult = 2.5 + max(0.0, (width - 256) / 64.0)
        return int(4 * mult * rows)

    # -- hooks -------------------------------------------------------------

    def _build_apply(self, lanes):
        raise NotImplementedError

    def _build_loss_grad(self, lanes):
        """Optional ONE-kernel ``(weights, batch_t[, ctx_t]) -> (loss,
        grads)`` builder. When a subclass provides it, every train step
        uses it instead of autodiff over the custom_vjp apply — one launch
        and 3 forward-equivalents of FLOPs instead of the split path's 5
        (forward kernel + chain recompute + per-layer vjp re-runs). The
        custom_vjp apply remains the composable path (embedding nets,
        input cotangents, VI objectives).

        Contract: the (loss, grads) this builder returns MUST encode the
        exact objective of the trainer's ``_loss_from_apply``. A subclass
        that overrides ``_loss_from_apply`` (a different objective, e.g.
        the IAF VI loss) and does not provide a matching one-kernel
        builder is handled automatically: ``_value_and_grad`` falls back
        to autodiff over the (overridden) loss whenever
        ``_loss_from_apply`` is customized, even if a non-None
        ``_build_loss_grad`` is inherited."""
        return None

    def _fold(self, weights):
        """Differentiable pre-kernel weight fold (identity by default)."""
        return weights

    # -- loss --------------------------------------------------------------

    def _guard_ctx(self, ctx_t):
        """Trace-time conditionality check: a conditional trainer must not
        silently run the kernel with zero context weights, and an
        unconditional one must not silently drop a passed context."""
        if self._has_ctx and ctx_t is None:
            raise ValueError(
                "this trainer wraps a conditional flow "
                f"(context_features={self.context_features}); "
                "pass ctx_t=[C, N] — omitting it would silently "
                "drop the context weights from the kernel")
        if not self._has_ctx and ctx_t is not None:
            raise ValueError(
                "this trainer wraps an unconditional flow; "
                "got an unexpected ctx_t")

    def _loss_from_apply(self, apply):
        """-mean log_prob through a given fused apply."""
        log_z = 0.5 * self.features * math.log(2.0 * math.pi)

        def loss(weights, batch_t, ctx_t=None):
            self._guard_ctx(ctx_t)
            folded = self._fold(weights)
            if self._has_ctx:
                y_t, lad = apply(folded, batch_t, ctx_t)
            else:
                y_t, lad = apply(folded, batch_t)
            lp = -0.5 * jnp.sum(y_t * y_t, axis=0) - log_z + lad[0]
            return -jnp.mean(lp)

        return loss

    def loss_fn(self, weights, batch_t, ctx_t=None):
        """-mean log_prob; ``batch_t`` is [D, N] (samples on lanes) and,
        for conditional flows, ``ctx_t`` is the [C, N] context."""
        return self._loss_from_apply(self._apply)(weights, batch_t, ctx_t)

    def _value_and_grad(self, lanes=None, apply=None):
        """(weights, batch_t, ctx_t) -> (loss, grads): the one-kernel
        fused path when the subclass provides one, else
        ``jax.value_and_grad`` over the custom_vjp loss. Differentiation
        through ``_fold`` (e.g. the AR mask fold) happens in XLA via
        ``jax.vjp`` either way."""
        lanes = self._lanes if lanes is None else lanes
        # The one-kernel builder hardcodes the NLL objective, so it is
        # only sound when the trainer's loss IS the base-class NLL; a
        # subclass that overrides _loss_from_apply (e.g. a VI objective)
        # must not inherit a mismatched fused builder.
        custom_loss = (type(self)._loss_from_apply
                       is not FusedTrainerBase._loss_from_apply)
        lg = None if custom_loss else self._build_loss_grad(lanes)
        if lg is None:
            if apply is None:
                apply = (self._apply if lanes == self._lanes
                         else self._build_apply(lanes))
            loss = self._loss_from_apply(apply)

            def vag(weights, batch_t, ctx_t=None):
                return jax.value_and_grad(loss)(weights, batch_t, ctx_t)

            return vag

        def vag(weights, batch_t, ctx_t=None):
            self._guard_ctx(ctx_t)
            folded, fold_vjp = jax.vjp(self._fold, weights)
            if self._has_ctx:
                loss, gfolded = lg(folded, batch_t, ctx_t)
            else:
                loss, gfolded = lg(folded, batch_t)
            (grads,) = fold_vjp(gfolded)
            return loss, grads

        return vag

    def init_opt(self, optimizer):
        return optimizer.init(self.weights)

    # -- train steps -------------------------------------------------------

    def make_train_step(self, optimizer, donate=True):
        """Conditional flows take ``step(weights, opt_state, batch,
        context)``; unconditional ones ``step(weights, opt_state, batch)``.
        """
        import optax

        vag = self._value_and_grad()

        def _update(weights, opt_state, batch, context):
            batch_t = jnp.asarray(batch, jnp.float32).T
            ctx_t = (None if context is None
                     else jnp.asarray(context, jnp.float32).T)
            loss, grads = vag(weights, batch_t, ctx_t)
            updates, opt_state = optimizer.update(grads, opt_state, weights)
            return optax.apply_updates(weights, updates), opt_state, loss

        if self._has_ctx:
            def step(weights, opt_state, batch, context):
                return _update(weights, opt_state, batch, context)
        else:
            def step(weights, opt_state, batch):
                return _update(weights, opt_state, batch, None)

        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def make_dp_train_step(self, optimizer, mesh, data_axis="data",
                           donate=True):
        """Data-parallel fused training over a ``jax.sharding.Mesh``: each
        device runs the forward+backward megakernels on its batch shard
        (``shard_map``), gradients and loss are ``pmean``'d over ICI, and
        the (replicated) optimizer update is applied identically
        everywhere. ``batch`` (and ``context``, when conditional) is the
        GLOBAL array, sharded on its leading axis; weights and opt_state
        are replicated. Per-device batch must be a multiple of the
        128-lane kernel tile.
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
        P = PartitionSpec
        vag = self._value_and_grad(self._lane_tile(per_dev))

        def _shard_update(weights, opt_state, batch, context):
            ctx_t = None if context is None else context.T
            loss, grads = vag(weights, batch.T, ctx_t)
            # equal shards: global mean = pmean of per-shard means
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            updates, opt_state = optimizer.update(grads, opt_state, weights)
            return optax.apply_updates(weights, updates), opt_state, loss

        if self._has_ctx:
            def shard_step(weights, opt_state, batch, context):
                return _shard_update(weights, opt_state, batch, context)
            in_specs = (P(), P(), P(data_axis), P(data_axis))
        else:
            def shard_step(weights, opt_state, batch):
                return _shard_update(weights, opt_state, batch, None)
            in_specs = (P(), P(), P(data_axis))

        # pallas_call does not carry the varying-across-mesh (vma) type
        # shard_map's replication checker needs, so disable the check —
        # replication is real here (pmean'd grads, identical updates) and
        # pinned by tests/parallel/test_fused_dp.py
        try:
            sharded = shard_map(
                shard_step, mesh=mesh, in_specs=in_specs,
                out_specs=(P(), P(), P()), check_vma=False)
        except TypeError:  # older jax spells it check_rep
            sharded = shard_map(
                shard_step, mesh=mesh, in_specs=in_specs,
                out_specs=(P(), P(), P()), check_rep=False)
        return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())

    # -- ZeRO optimizer-state sharding ------------------------------------

    def _zero_specs(self, mesh, data_axis, min_shard_elements):
        """Per-weight PartitionSpecs for the fp32 Adam moments: one dim of
        each big-enough leaf sharded over ``data_axis`` (same placement
        rule as :func:`nflows_tpu.parallel.fsdp.fsdp_sharding`), small
        leaves replicated."""
        from jax.sharding import PartitionSpec as P

        from nflows_tpu.parallel.fsdp import _shard_spec

        n = mesh.shape[data_axis]
        return {
            k: _shard_spec(w.shape, n, min_shard_elements, data_axis) or P()
            for k, w in self.weights.items()
        }

    def init_opt_sharded(self, optimizer, mesh, data_axis="data",
                         min_shard_elements=8192):
        """Optimizer state with its moments SHARDED over ``data_axis``
        (ZeRO-1/2): init runs on a sharded view of the weights, so every
        moment leaf inherits that leaf's shard spec while the kernel's own
        weights stay replicated (they must be whole in VMEM). Pair with
        :meth:`make_zero_train_step` built with the same
        ``min_shard_elements``."""
        from jax.sharding import NamedSharding

        specs = self._zero_specs(mesh, data_axis, min_shard_elements)
        sharded_w = {
            k: jax.device_put(w, NamedSharding(mesh, specs[k]))
            for k, w in self.weights.items()
        }
        # EAGER init: optax moments are zeros_like(param), which preserves
        # the committed shard layout leaf-by-leaf (a jitted init would let
        # XLA pick output shardings — zeros have no data dependence on the
        # inputs, so it picks replicated)
        return optimizer.init(sharded_w)

    def make_zero_train_step(self, optimizer, mesh, data_axis="data",
                             donate=True, min_shard_elements=8192):
        """Fused DP training with ZeRO-sharded optimizer state.

        Composes the two round-4 flagships: the forward+backward
        megakernels run per batch shard under ``shard_map`` (kernel
        weights REPLICATED — they are VMEM-resident), while the fp32 Adam
        moments live sharded over ``data_axis`` and only ever touch their
        local shard. Per step:

        - each device computes its shard's gradients in the fused kernel;
        - each gradient leaf is ``psum_scatter``'d straight to its moment
          shard (summed + scattered in one collective — half the bytes of
          the DP step's ``pmean``), small/unshardable leaves ``pmean``;
        - the optimizer update runs elementwise on the shards (GSPMD, no
          communication);
        - updated weight shards are all-gathered back to replicated for
          the next kernel launch.

        Comm per step is the ZeRO-2 optimum (reduce-scatter(G) +
        all-gather(W)); per-device optimizer memory drops to ~1/N on the
        sharded leaves (machine-checked in
        tests/parallel/test_fused_zero.py, alongside step numerics ==
        the unsharded fused step). Use :meth:`init_opt_sharded` (same
        ``min_shard_elements``) for the optimizer state. The reference
        has no distributed counterpart (SURVEY.md §2.6).

        ``batch`` (and ``context``) is the GLOBAL array, sharded on its
        leading axis; per-device batch must be a multiple of the 128-lane
        kernel tile.
        """
        import optax
        from jax.sharding import NamedSharding, PartitionSpec
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        P = PartitionSpec
        n = mesh.shape[data_axis]
        per_dev = self.batch_size // n
        if self.batch_size % n or per_dev % 128:
            raise ValueError(
                f"global batch {self.batch_size} over {n} '{data_axis}' "
                "devices must give a per-device batch that is a multiple "
                "of 128")
        specs = self._zero_specs(mesh, data_axis, min_shard_elements)
        vag = self._value_and_grad(self._lane_tile(per_dev))
        inv_n = 1.0 / n

        def _scatter(g, spec):
            dim = next((i for i, a in enumerate(spec) if a is not None),
                       None)
            if dim is None:
                return jax.lax.pmean(g, data_axis)
            # sum of shard-means / n == global-batch mean (equal shards)
            return inv_n * jax.lax.psum_scatter(
                g, data_axis, scatter_dimension=dim, tiled=True)

        def _grads_part(weights, batch, context):
            ctx_t = None if context is None else context.T
            loss, grads = vag(weights, batch.T, ctx_t)
            gshards = {k: _scatter(g, specs[k]) for k, g in grads.items()}
            return gshards, jax.lax.pmean(loss, data_axis)

        if self._has_ctx:
            def grads_part(weights, batch, context):
                return _grads_part(weights, batch, context)
            in_specs = (P(), P(data_axis), P(data_axis))
        else:
            def grads_part(weights, batch):
                return _grads_part(weights, batch, None)
            in_specs = (P(), P(data_axis))

        # check_vma=False for the same reason as make_dp_train_step:
        # pallas_call carries no varying-across-mesh type
        try:
            sharded_grads = shard_map(
                grads_part, mesh=mesh, in_specs=in_specs,
                out_specs=(dict(specs), P()), check_vma=False)
        except TypeError:  # older jax spells it check_rep
            sharded_grads = shard_map(
                grads_part, mesh=mesh, in_specs=in_specs,
                out_specs=(dict(specs), P()), check_rep=False)

        def _constrain(tree, to_specs):
            return {
                k: jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, to_specs[k]))
                for k, v in tree.items()
            }

        rep = {k: P() for k in specs}

        def _update(weights, opt_state, batch, context):
            args = (weights, batch) if context is None else (
                weights, batch, context)
            gshards, loss = sharded_grads(*args)
            # replicated -> sharded is a local slice; the update then runs
            # entirely on shards, and only the updated weights are
            # all-gathered (the with_sharding_constraint back to P())
            wshards = _constrain(weights, specs)
            updates, opt_state = optimizer.update(gshards, opt_state,
                                                  wshards)
            new_w = optax.apply_updates(wshards, updates)
            return _constrain(new_w, rep), opt_state, loss

        if self._has_ctx:
            def step(weights, opt_state, batch, context):
                return _update(weights, opt_state, batch, context)
        else:
            def step(weights, opt_state, batch):
                return _update(weights, opt_state, batch, None)

        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def init_loop_state(self, optimizer):
        """A ``TrainState`` carrying the kernel-layout weights
        (``params=weights, rest=None``), so the fused trainers compose
        with ``training.loop.run_training``'s checkpoint/resume/metric
        machinery unchanged."""
        from nflows_tpu.training.train import TrainState

        return TrainState(params=self.weights, rest=None,
                          opt_state=self.init_opt(optimizer))

    def make_loop_step(self, optimizer, donate=True):
        """Build ``step(state, batch[, context]) -> (state, metrics)`` —
        the ``run_training`` contract — over the fused loss. Pair with
        :meth:`init_loop_state`."""
        import optax

        vag = self._value_and_grad()

        def _update(state, batch, context):
            batch_t = jnp.asarray(batch, jnp.float32).T
            ctx_t = (None if context is None
                     else jnp.asarray(context, jnp.float32).T)
            loss, grads = vag(state.params, batch_t, ctx_t)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            new_state = state.replace(
                params=optax.apply_updates(state.params, updates),
                opt_state=opt_state, step=state.step + 1)
            return new_state, {"loss": loss}

        if self._has_ctx:
            def step(state, batch, context):
                return _update(state, batch, context)
        else:
            def step(state, batch):
                return _update(state, batch, None)

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_scan_train_step(self, optimizer, donate=True):
        """One dispatch = one ``lax.scan`` over ``batches``' leading axis —
        the same scan-fused loop shape bench.py uses for the XLA path.
        Conditional flows scan over ``(batches, contexts)`` pairs.
        ``donate=False`` keeps the caller's weights/opt_state buffers alive
        (e.g. when re-timing from the same initial state)."""
        import optax

        vag = self._value_and_grad()

        def one(carry, xs):
            weights, opt_state = carry
            if self._has_ctx:
                batch, context = xs
                args = (batch.T, context.T)
            else:
                args = (xs.T,)
            loss, grads = vag(weights, *args)
            updates, opt_state = optimizer.update(grads, opt_state, weights)
            return (optax.apply_updates(weights, updates), opt_state), loss

        if self._has_ctx:
            def steps(weights, opt_state, batches, contexts):
                (weights, opt_state), losses = jax.lax.scan(
                    one, (weights, opt_state), (batches, contexts))
                return weights, opt_state, losses
        else:
            def steps(weights, opt_state, batches):
                (weights, opt_state), losses = jax.lax.scan(
                    one, (weights, opt_state), batches)
                return weights, opt_state, losses

        return jax.jit(steps, donate_argnums=(0, 1) if donate else ())
