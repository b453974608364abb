"""Mesh-sharded training and sampling.

Data-parallel SPMD via ``shard_map``: each device computes the loss/grad on
its batch shard; gradients are reduced with ``psum`` over the ``data`` axis
(the TPU equivalent of the reference's nonexistent NCCL allreduce —
SURVEY.md §2.6). Parameters and optimizer state are replicated (or
TP-sharded via :func:`tensor_parallel_sharding`), so after the psum every
device applies an identical update — no parameter broadcast needed.

Sampling scales the same way: the sample axis is sharded over ``data``
(the flow analogue of sequence parallelism), each device inverting the
transform chain on its shard with a device-unique PRNG fold.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from nflows_tpu.core.module import combine, set_stats_axis
from nflows_tpu.parallel.mesh import data_sharding
from nflows_tpu.training.train import TrainState, nll_loss

__all__ = [
    "make_sharded_train_step",
    "make_gspmd_train_step",
    "make_sharded_sampler",
    "tensor_parallel_sharding",
    "apply_tensor_parallelism",
]


def make_sharded_train_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Callable = nll_loss,
    donate: bool = True,
    with_context: bool = False,
):
    """Build an explicit shard_map DP train step over ``mesh``.

    ``step(state, batch[, context]) -> (state, metrics)`` with the batch
    (and context) sharded on the 'data' axis. Loss/grads are the global
    batch mean via pmean over ICI. Parameters and optimizer state are
    REPLICATED (in_spec P()): to train a tensor-parallel-sharded flow use
    :func:`make_gspmd_train_step`, which preserves the param shardings and
    lets XLA place the collectives.
    """

    state_spec = P()       # replicated params/opt state
    batch_spec = P("data")

    def local_step(state: TrainState, batch, context=None):
        def compute_loss(params):
            flow = combine(params, state.rest)
            # batch-statistic normalizers (BatchNorm, conditioner batch
            # norm) must reduce over the GLOBAL batch, not this device's
            # shard — point their stats at the mapped axis
            flow = set_stats_axis(flow, "data")
            # local mean; pmean'd below so the loss/grad is the global
            # batch mean regardless of shard count
            return loss_fn(flow, batch, context)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        loss = jax.lax.pmean(loss, axis_name="data")
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, axis_name="data"), grads
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss}

    in_specs = (state_spec, batch_spec) + ((batch_spec,) if with_context else ())
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_sharded_sampler(mesh: Mesh, num_samples_per_device: int):
    """Build ``sample(flow, key) -> [n_data_devices * n_per_device, ...]``.

    Each device draws its own shard with a key folded by its mesh position,
    then inverts the transform chain locally; the result is a globally
    sharded sample array (gather it only if the host needs it).
    """

    def local_sample(flow, key):
        idx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, idx)
        return flow._sample(key, num_samples_per_device, None)

    sharded = shard_map(
        local_sample,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_gspmd_train_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Callable = nll_loss,
    donate: bool = True,
):
    """Build a GSPMD (auto-partitioned) train step: DP x TP composition.

    The batch is constrained to P('data'); the TrainState keeps whatever
    shardings its arrays already carry (e.g. from
    :func:`apply_tensor_parallelism`), and XLA inserts the gradient
    all-reduce over 'data' and the TP collectives over 'model'. Unlike
    :func:`make_sharded_train_step` (explicit shard_map, replicated
    params), TP-sharded parameters STAY sharded through the update —
    sharding propagation keeps new_params on the same layout, so per-device
    parameter/optimizer memory is 1/TP-degree.

    ``step(state, batch, context=None) -> (state, metrics)``.
    """
    batch_sharding = data_sharding(mesh)

    def step(state: TrainState, batch, context=None):
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)

        def compute_loss(params):
            flow = combine(params, state.rest)
            return loss_fn(flow, batch, context)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Tensor parallelism over conditioner hidden dims
# ---------------------------------------------------------------------------

def tensor_parallel_sharding(flow, mesh: Mesh):
    """Build a pytree of NamedShardings for ``flow``: Megatron-style
    column->row pairing over the conditioner hidden GEMMs, all else
    replicated.

    Flows are narrow; TP pays off only for very wide conditioners
    (SURVEY.md §2.6 marks TP optional; tests/parallel/test_tp_evidence.py
    machine-checks the 1/TP per-device param+optimizer memory win and the
    collective placement). The rule walks the module tree by CLASS (not
    field names, which MADE shares with ResidualNet):

    - ``ResidualNet``: the residual stream stays REPLICATED throughout.
      ``initial_layer``/``final_layer`` are the small [in,H]/[H,out]
      matrices — replicated. Each block pairs ``linear_0`` column-sharded
      P(...,'model') (bias P('model')) with ``linear_1`` ROW-sharded
      P('model',...) (bias replicated): partial sums meet in exactly ONE
      all-reduce per block (the Megatron pattern), and the H x H block
      GEMMs are where the parameter mass is.
    - ``MLP``: hidden layers alternate column/row the same way;
      ``output_layer`` is row-sharded iff the stream arrives sharded.
    - Anything inside ``MADE``/``MaskedDense`` is replicated: the masks
      encode autoregressive degree structure and sharding them would
      split degrees arbitrarily.

    Works for scan-stacked flows too: ``[L, ...]``-stacked leaves get the
    same specs with a leading replicated axis. Dims that don't divide the
    model-axis size fall back to replicated. XLA places the all-reduces
    over ICI.
    """
    from nflows_tpu.core.module import Module
    from nflows_tpu.nn.made import MADE, MaskedDense
    from nflows_tpu.nn.nets.mlp import MLP
    from nflows_tpu.nn.nets.resnet import ResidualBlock, ResidualNet

    model_size = mesh.shape["model"]
    rep = NamedSharding(mesh, P())

    def rep_tree(x):
        return jax.tree_util.tree_map(lambda _: rep, x)

    def dense_tree(dense, kind):
        """Sharding pytree for a Dense (possibly [L, ...]-stacked)."""
        w = dense.weight
        pad = (None,) * (w.ndim - 2)           # leading stacked axes
        if kind == "col" and w.shape[-1] % model_size == 0:
            w_spec = NamedSharding(mesh, P(*pad, None, "model"))
            b_spec = NamedSharding(mesh, P(*pad, "model"))
        elif kind == "row" and w.shape[-2] % model_size == 0:
            w_spec = NamedSharding(mesh, P(*pad, "model", None))
            b_spec = rep
        else:
            w_spec, b_spec = rep, rep
        return dense.replace(
            weight=w_spec,
            bias=None if dense.bias is None else b_spec,
        )

    def block_tree(block: ResidualBlock):
        updates = {f: rep_tree(getattr(block, f))
                   for f in type(block)._child_fields}
        updates["linear_0"] = dense_tree(block.linear_0, "col")
        updates["linear_1"] = dense_tree(block.linear_1, "row")
        return block.replace(**updates)

    def walk(x):
        if isinstance(x, (MADE, MaskedDense)):
            return rep_tree(x)
        if isinstance(x, ResidualNet):
            updates = {f: walk(getattr(x, f)) for f in type(x)._child_fields}
            updates["initial_layer"] = rep_tree(x.initial_layer)
            updates["final_layer"] = rep_tree(x.final_layer)
            updates["blocks"] = tuple(block_tree(b) for b in x.blocks)
            return x.replace(**updates)
        if isinstance(x, MLP):
            hidden = []
            sharded_stream = False
            for layer in x.hidden_layers:
                hidden.append(dense_tree(layer, "row" if sharded_stream
                                         else "col"))
                sharded_stream = not sharded_stream
            return x.replace(
                input_layer=rep_tree(x.input_layer),
                hidden_layers=tuple(hidden),
                output_layer=(dense_tree(x.output_layer, "row")
                              if sharded_stream
                              else rep_tree(x.output_layer)),
            )
        if isinstance(x, Module):
            return x.replace(**{f: walk(getattr(x, f))
                                for f in type(x)._child_fields})
        if isinstance(x, (tuple, list)):
            items = [walk(v) for v in x]
            if hasattr(type(x), "_fields"):
                return type(x)(*items)
            return type(x)(items)
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items()}
        if x is None:
            return None
        return rep

    return walk(flow)


def apply_tensor_parallelism(flow, mesh: Mesh):
    """device_put the flow with TP shardings from tensor_parallel_sharding."""
    shardings = tensor_parallel_sharding(flow, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if s is not None else x,
        flow, shardings,
        is_leaf=lambda x: x is None,
    )
