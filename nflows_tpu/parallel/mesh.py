"""Device-mesh construction and sharding helpers.

The reference has no distributed code at all (SURVEY.md §2.6); this module
is the TPU-native communication layer: a named ``jax.sharding.Mesh`` over
the slice, with axes

- ``data``  — batch / sample / chain parallelism (the flow analogue of
  sequence parallelism: there is no sequence axis in a flow, so the axes
  that scale are the sample axis and — for wide elementwise spline stacks —
  the feature axis, see :mod:`nflows_tpu.parallel.elementwise`),
- ``model`` — tensor parallelism over conditioner hidden dims (flows are
  small; TP matters only for very wide conditioners).

Pipeline parallelism over the transform chain is provided separately in
:mod:`nflows_tpu.parallel.pipeline` (GPipe-style microbatch schedule over a
``stage`` axis with ``ppermute`` over ICI) — useful when per-device
parameter memory, not batch throughput, is the constraint. Expert
parallelism has no counterpart (no MoE routing; MADEMoG mixtures are
per-feature, not routed) — documented as N/A per SURVEY.md §2.6.

Collectives ride ICI: gradient/statistic reductions are ``psum`` over
``data`` inside ``shard_map``; XLA inserts all-gathers for TP-sharded
weights. Multi-host bootstrap is ``jax.distributed.initialize()`` (DCN),
wrapped in :func:`initialize_distributed`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "replicated",
    "data_sharding",
    "shard_batch",
]


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``data=None`` uses all devices not consumed by ``model``.
    """
    explicit = devices is not None
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        if explicit or data * model > n:
            raise ValueError(
                f"mesh ({data} x {model}) needs {data * model} devices, "
                f"got {n}"
            )
        devices = devices[: data * model]
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bootstrap over DCN. No-op on a single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place a host array with its batch dim sharded across 'data'."""
    return jax.device_put(batch, data_sharding(mesh, np.ndim(batch)))
