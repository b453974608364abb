"""Fully-sharded data parallelism (FSDP / ZeRO-3) for flow parameters.

The reference has no distributed code at all (SURVEY.md §2.6); DP/TP/PP
here already cover its training at any width this library realistically
reaches. FSDP completes the memory-scaling story for the production
regime the north star names (very wide conditioners, large meshes): each
parameter — and, through sharding propagation, its Adam moments — lives
SHARDED over the ``data`` axis, cut along one dimension; XLA inserts the
all-gather at each use site and a reduce-scatter for the matching
gradient shard (the scaling-book recipe: pick a mesh, annotate
shardings, let XLA place collectives over ICI).

Per-device parameter+optimizer memory drops to ~1/N on the sharded
leaves (machine-checked in tests/parallel/test_fsdp.py, alongside
collective placement in the compiled HLO and exact numerics vs the
replicated GSPMD step).

Usage::

    mesh = make_mesh(data=8)
    flow = apply_fsdp(flow, mesh)              # device_put with shardings
    state = create_train_state(flow, optimizer)  # opt state inherits them
    step = make_gspmd_train_step(optimizer, mesh)  # XLA does the rest

Composition with tensor parallelism: apply TP first
(:func:`~nflows_tpu.parallel.train.apply_tensor_parallelism`), then
``apply_fsdp(flow, mesh, respect=tensor_parallel_sharding(flow, mesh))``
shards only the leaves TP left replicated, along the ``data`` axis —
the standard 2-D (FSDP x TP) layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_sharding", "apply_fsdp"]

# Leaves smaller than this many ELEMENTS stay replicated: an all-gather
# of a tiny vector costs a latency-bound collective per use without
# saving meaningful memory. 2^13 fp32 elements = 32 KiB.
_MIN_SHARD_ELEMENTS = 8192


def _shard_spec(shape, n, min_shard_elements, axis="data") -> Optional[P]:
    """PartitionSpec sharding ONE dimension over the ``axis`` mesh axis,
    or None.

    Picks the largest dimension divisible by ``n`` (ties -> first), so
    [H, H] conditioner weights shard rows, [3K-1, H]-style heads shard
    the H column, and biases shard their only dim when long enough.
    """
    if not shape or int(np.prod(shape)) < min_shard_elements:
        return None
    divisible = [d for d, s in enumerate(shape) if s % n == 0 and s >= n]
    if not divisible:
        return None
    dim = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[dim] = axis
    return P(*spec)


def fsdp_sharding(flow, mesh: Mesh, respect=None,
                  min_shard_elements: int = _MIN_SHARD_ELEMENTS):
    """Pytree of NamedShardings (or None = leave as-is) for ``flow``.

    Every floating-point array leaf big enough to matter is sharded along
    one dimension over the mesh's ``data`` axis; integer/bool buffers
    (permutation indices, masks) and small leaves stay replicated.
    ``respect`` is an optional pytree of shardings (e.g. from
    :func:`~nflows_tpu.parallel.train.tensor_parallel_sharding`) whose
    non-replicated entries are preserved untouched.
    ``min_shard_elements`` sets the leaf-size floor below which leaves
    stay replicated (default 8192 elements = 32 KiB fp32); lower it for
    small test models, raise it to keep more latency-bound collectives
    off narrow layers.
    """
    n = mesh.shape["data"]
    rep = NamedSharding(mesh, P())

    def leaf_sharding(x, r):
        if not hasattr(x, "shape") or not hasattr(x, "dtype"):
            return None
        # preserve only ACTUALLY-sharded respect entries (TP returns
        # replicated P() shardings for its non-TP leaves — those are fair
        # game for the data axis)
        r_spec = getattr(r, "spec", None)
        if r_spec is not None and any(a is not None for a in r_spec):
            return r
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return rep
        spec = _shard_spec(x.shape, n, min_shard_elements)
        return NamedSharding(mesh, spec) if spec is not None else rep

    if respect is None:
        return jax.tree_util.tree_map(lambda x: leaf_sharding(x, None), flow)
    return jax.tree_util.tree_map(
        leaf_sharding, flow, respect,
        is_leaf=lambda x: x is None)


def apply_fsdp(flow, mesh: Mesh, respect=None,
               min_shard_elements: int = _MIN_SHARD_ELEMENTS):
    """device_put ``flow`` with :func:`fsdp_sharding` shardings.

    The returned flow's arrays are sharded over ``data``;
    ``create_train_state`` then makes Adam moments with the same
    shardings (optax init mirrors param structure), and
    ``make_gspmd_train_step`` trains with XLA-placed all-gathers /
    reduce-scatters. Checkpointing via ``training.checkpoint`` is
    sharding-preserving, so FSDP states save/restore unchanged.
    ``min_shard_elements`` is forwarded to :func:`fsdp_sharding`.
    """
    shardings = fsdp_sharding(flow, mesh, respect=respect,
                              min_shard_elements=min_shard_elements)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if s is not None else x,
        flow, shardings,
        is_leaf=lambda x: x is None)
