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
    collective placement). The rule is STRUCTURAL, not name-guessing: it
    targets ``ResidualNet``/``MLP`` conditioners (nn/nets/) —

    - ``initial_layer``:   column-shard P(None,'model'), bias P('model')
      (activations come out 'model'-sharded);
    - ``blocks[i].linear_0``: column-shard (consumes replicated residual
      stream, produces sharded hidden);
    - ``blocks[i].linear_1``: ROW-shard P('model',None), bias replicated —
      partial sums meet in ONE all-reduce per block (the Megatron pattern),
      so the residual stream stays replicated;
    - ``final_layer``:     row-shard, bias replicated.

    MADE's MaskedDense layers are left replicated: their masks encode the
    autoregressive degree structure and column-sharding them would split
    degrees arbitrarily. XLA places the all-reduces over ICI.
    """
    model_size = mesh.shape["model"]
    col = NamedSharding(mesh, P(None, "model"))
    row = NamedSharding(mesh, P("model", None))
    vec = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())

    def rule(path, leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return None
        names = [p.name for p in path if hasattr(p, "name")]
        leafname = names[-1] if names else ""
        if "mask" in names or any("masked" in n.lower() for n in names):
            return rep
        divisible = leaf.ndim >= 1 and all(
            s % model_size == 0 for s in leaf.shape if s > 1
        )
        if leaf.ndim == 2 and leafname == "weight":
            if leaf.shape[-1] % model_size == 0 and (
                    "initial_layer" in names or "linear_0" in names):
                return col
            if leaf.shape[0] % model_size == 0 and (
                    "linear_1" in names or "final_layer" in names):
                return row
            return rep
        if leaf.ndim == 1 and leafname == "bias" and divisible and (
                "initial_layer" in names or "linear_0" in names):
            return vec
        return rep

    return jax.tree_util.tree_map_with_path(rule, flow)


def apply_tensor_parallelism(flow, mesh: Mesh):
    """device_put the flow with TP shardings from tensor_parallel_sharding."""
    shardings = tensor_parallel_sharding(flow, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if s is not None else x,
        flow, shardings,
        is_leaf=lambda x: x is None,
    )
