"""Shared in-kernel helpers for the whole-flow megakernels.

Every megakernel opens with the same protocol: on grid step 0, DMA all
weight stacks from HBM into single-buffered VMEM scratch, optionally do
other setup (e.g. zero gradient accumulators) while the copies fly, then
wait. These helpers are that protocol in one place so a change to the
load scheme (semaphore layout, buffering) lands in every kernel at once.
"""

from __future__ import annotations

__all__ = ["start_weight_dmas", "wait_dmas"]


def start_weight_dmas(pairs, dma_sems):
    """Kick off one async HBM->VMEM copy per (src, dst) pair; returns the
    in-flight copies for :func:`wait_dmas`."""
    from jax.experimental.pallas import tpu as pltpu

    dmas = [
        pltpu.make_async_copy(src, dst, dma_sems.at[i])
        for i, (src, dst) in enumerate(pairs)
    ]
    for dma in dmas:
        dma.start()
    return dmas


def wait_dmas(dmas):
    for dma in dmas:
        dma.wait()
