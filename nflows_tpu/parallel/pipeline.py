"""Pipeline parallelism over the transform chain (GPipe-style).

The reference has no pipeline parallelism (no distributed code at all —
SURVEY.md §2.6); this module is the TPU-native realization of the plan named
there: stage the ``CompositeTransform`` chain across devices and stream
microbatches through the stages with ``jax.lax.ppermute`` over ICI.

Design
------
A chain of ``L`` *structurally identical* blocks (same pytree treedef — e.g.
NSF layers, each ``CompositeTransform([RandomPermutation, RQCoupling])``) is
stacked leaf-wise into one pytree with a leading block axis ``[L, ...]`` and
sharded over the mesh's ``stage`` axis, giving each of ``S`` devices a
contiguous group of ``L/S`` blocks. Inside ``shard_map`` every device runs
the same program:

- at schedule tick ``t`` (of ``T = M + S - 1`` ticks for ``M`` microbatches),
  stage ``s`` processes microbatch ``t - s``: stage 0 injects a fresh
  microbatch, later stages take the ``(y, logabsdet)`` state handed to them
  by ``ppermute`` from the previous stage at the end of the previous tick;
- each stage applies its local blocks with a ``lax.scan`` over the block
  axis (blocks are sliced back into real Module pytrees by scan itself);
- the last stage accumulates finished microbatches into an output buffer,
  which is broadcast to all stages with a masked ``psum`` at the end.

The schedule is the classic GPipe fill/drain pipeline: bubble fraction
``(S-1)/(M+S-1)``, so choose ``num_microbatches >> num_stages``. Flow layers
are cheap relative to their activations, so pipeline parallelism only pays
at very deep chains / very wide conditioners — data parallelism is the
default scaling axis (parallel/train.py); this exists for the regime where
per-device parameter memory, not batch throughput, is the constraint.

All of this composes with jit: the tick loop is a ``lax.fori_loop`` with a
static trip count, the per-stage block loop is a ``lax.scan``, and the
inter-stage transfer is a single ``ppermute`` per tick riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "make_pipeline_mesh",
    "stack_transforms",
    "make_pipelined_transform",
]


def make_pipeline_mesh(num_stages: int, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh with axis ``stage`` over ``num_stages`` devices.

    Kept separate from the (data, model) training mesh (parallel/mesh.py):
    a pipeline run owns its devices for the duration of the dispatch, and
    JAX programs may use different meshes for different jitted functions.
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) < num_stages:
        raise ValueError(
            f"need {num_stages} devices for {num_stages} stages, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[:num_stages])
    return Mesh(arr, axis_names=("stage",))


def stack_transforms(blocks: Sequence):
    """Stack structurally identical transform blocks leaf-wise: every array
    leaf gains a leading ``[L]`` block axis. Raises if treedefs differ
    (different statics / different classes cannot share one pipeline stage
    program)."""
    blocks = list(blocks)
    treedefs = {str(jax.tree_util.tree_structure(b)) for b in blocks}
    if len(treedefs) != 1:
        raise ValueError(
            "pipeline blocks must be structurally identical (same classes, "
            f"same static config); got {len(treedefs)} distinct treedefs"
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def make_pipelined_transform(
    blocks: Sequence,
    mesh: Mesh,
    num_microbatches: int,
    direction: str = "forward",
    axis: str = "stage",
):
    """Build ``fn(x[, context]) -> (y, logabsdet)`` running ``blocks`` as a
    microbatch pipeline over ``mesh``'s ``axis``.

    Semantically identical to ``CompositeTransform(blocks).forward`` (or
    ``.inverse`` with ``direction='inverse'``); the batch dim must be
    divisible by ``num_microbatches``.
    """
    if direction not in ("forward", "inverse"):
        raise ValueError(f"direction must be forward|inverse, got {direction}")
    num_stages = mesh.shape[axis]
    num_blocks = len(blocks)
    if num_blocks % num_stages != 0:
        raise ValueError(
            f"{num_blocks} blocks not divisible by {num_stages} stages"
        )
    inverse = direction == "inverse"
    # Inverse runs the chain back-to-front: reverse block order so stage 0
    # holds the chain's tail, and apply each block's .inverse.
    ordered = list(blocks)[::-1] if inverse else list(blocks)
    stacked = stack_transforms(ordered)
    M = num_microbatches
    S = num_stages
    perm = [(i, (i + 1) % S) for i in range(S)]

    def apply_stage(local_blocks, y, lad, context):
        def body(carry, block):
            y, lad = carry
            fn = block.inverse if inverse else block.forward
            out, ld = fn(y, context)
            return (out, lad + ld), None

        (y, lad), _ = jax.lax.scan(body, (y, lad), local_blocks)
        return y, lad

    def local_fn(local_blocks, x_mb, ctx_mb=None):
        # x_mb: [M, mb, ...] replicated on every stage; ctx_mb likewise.
        s = jax.lax.axis_index(axis)
        mb_shape = x_mb.shape[1:]
        state_y = jnp.zeros(mb_shape, x_mb.dtype)
        state_lad = jnp.zeros(mb_shape[:1], x_mb.dtype)
        out_y = jnp.zeros_like(x_mb)
        out_lad = jnp.zeros(x_mb.shape[:2], x_mb.dtype)

        def tick(t, carry):
            state_y, state_lad, out_y, out_lad = carry
            inj_idx = jnp.minimum(t, M - 1)
            y_in = jnp.where(s == 0, x_mb[inj_idx], state_y)
            lad_in = jnp.where(s == 0, jnp.zeros_like(state_lad), state_lad)
            # context is read-only conditioning: stage s works on microbatch
            # t - s at tick t, and ctx_mb is replicated, so index directly
            # instead of pipelining it through ppermute.
            ctx = None if ctx_mb is None else ctx_mb[jnp.clip(t - s, 0, M - 1)]
            y, lad = apply_stage(local_blocks, y_in, lad_in, ctx)
            # the last stage finishes microbatch t-(S-1) at tick t
            mb_idx = t - (S - 1)
            write = (s == S - 1) & (mb_idx >= 0)
            idx = jnp.maximum(mb_idx, 0)
            out_y = out_y.at[idx].set(jnp.where(write, y, out_y[idx]))
            out_lad = out_lad.at[idx].set(jnp.where(write, lad, out_lad[idx]))
            state_y = jax.lax.ppermute(y, axis, perm)
            state_lad = jax.lax.ppermute(lad, axis, perm)
            return state_y, state_lad, out_y, out_lad

        _, _, out_y, out_lad = jax.lax.fori_loop(
            0, M + S - 1, tick, (state_y, state_lad, out_y, out_lad)
        )
        # broadcast the last stage's buffers to every device
        last = (s == S - 1).astype(out_y.dtype)
        out_y = jax.lax.psum(out_y * last, axis)
        out_lad = jax.lax.psum(out_lad * last.astype(out_lad.dtype), axis)
        return out_y, out_lad

    def pipelined(x, context=None):
        batch = x.shape[0]
        if batch % M != 0:
            raise ValueError(f"batch {batch} not divisible by {M} microbatches")
        x_mb = x.reshape(M, batch // M, *x.shape[1:])

        if context is None:
            sharded = shard_map(
                local_fn, mesh=mesh,
                in_specs=(P(axis), P()), out_specs=(P(), P()),
                check_vma=False,
            )
            out_y, out_lad = sharded(stacked, x_mb)
        else:
            ctx_mb = context.reshape(M, batch // M, *context.shape[1:])
            sharded = shard_map(
                local_fn, mesh=mesh,
                in_specs=(P(axis), P(), P()), out_specs=(P(), P()),
                check_vma=False,
            )
            out_y, out_lad = sharded(stacked, x_mb, ctx_mb)
        return out_y.reshape(batch, *x.shape[1:]), out_lad.reshape(batch)

    return jax.jit(pipelined)
