"""Feature-dimension sharding for elementwise transforms (the SP analogue).

Flows have no sequence axis, so classic sequence/context parallelism has no
direct counterpart (SURVEY.md §2.6/§5). Its closest analogues here are:

- the **sample/chain axis** of sampling/VI — sharded over ``data`` in
  parallel/train.py and parallel/vi.py;
- the **feature/bin dimension of elementwise spline evaluation** — this
  module: a learned-CDF transform (Piecewise*CDF) applies an independent
  spline to every feature with per-feature parameters ``[D, K]``, so both
  the parameter table and the feature axis of the activations shard cleanly
  across the mesh. Each device evaluates its feature slice; the only
  communication is one ``psum`` to reduce the per-feature logabsdet partial
  sums into the ``[batch]`` total.

This matters for very wide elementwise stacks (D in the tens of thousands —
e.g. flows over flattened images with learned marginal CDFs) where the
``[N, D, K]`` spline intermediates dominate per-device memory.
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_feature_sharded_elementwise"]


def make_feature_sharded_elementwise(
    transform,
    mesh: Mesh,
    axis: str = "data",
    direction: str = "forward",
):
    """Build ``fn(x) -> (y, logabsdet)`` applying an elementwise transform
    with the trailing feature axis (and the per-feature parameter tables)
    sharded over ``mesh``'s ``axis``.

    Requirements: ``transform`` must be elementwise with every parameter
    leaf's leading dim equal to the feature count (true for the
    Piecewise{Linear,Quadratic,Cubic,RationalQuadratic}CDF family), and the
    feature count divisible by the axis size.
    """
    if direction not in ("forward", "inverse"):
        raise ValueError(f"direction must be forward|inverse, got {direction}")
    inverse = direction == "inverse"

    def local_fn(t_local, x_local):
        fn = t_local.inverse if inverse else t_local.forward
        y, lad = fn(x_local)
        # each device holds a feature slice: its logabsdet is a partial
        # per-feature sum — reduce to the global [batch] total over ICI
        return y, jax.lax.psum(lad, axis)

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=(P(None, axis), P()),
        check_vma=False,
    )
    return jax.jit(lambda x: sharded(transform, x))
