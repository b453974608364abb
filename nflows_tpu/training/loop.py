"""Fault-tolerant training loop helper: periodic checkpoints + resume.

SURVEY.md §5: the reference has no failure-handling story; the TPU-native
plan is restart-from-checkpoint recovery on a static mesh (not elastic).
``run_training`` packages that: it restores the latest checkpoint if one
exists (preemption/restart), then steps the loader, checkpointing every
``checkpoint_every`` steps. Multi-host heartbeat/failure detection is
delegated to the jax.distributed runtime, which surfaces peer failures as
errors that crash the loop — the recovery path is simply re-running the
same command.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

from nflows_tpu.training.checkpoint import CheckpointManager
from nflows_tpu.training.train import TrainState
from nflows_tpu.utils.observability import MetricLogger

__all__ = ["run_training"]


def run_training(
    state: TrainState,
    step_fn: Callable,
    loader: Iterable,
    num_steps: int,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1000,
    log_every: int = 100,
    logger: Optional[MetricLogger] = None,
    prepare_batch: Callable = lambda b: b,
    fast_forward_data: bool = True,
) -> TrainState:
    """Run (or resume) a training loop.

    Restores the newest checkpoint in ``checkpoint_dir`` when present; saves
    every ``checkpoint_every`` steps and at the end. Returns final state.
    On resume the loader is fast-forwarded by the restored step count so the
    run continues the data stream (disable with ``fast_forward_data=False``
    if the loader is not deterministic or replay is too expensive).
    """
    logger = logger or MetricLogger()
    mgr = None
    if checkpoint_dir is not None:
        mgr = CheckpointManager(checkpoint_dir, max_to_keep=2)
        latest = mgr.latest_step()
        if latest is not None:
            state = mgr.restore(state)

    start = int(state.step)
    it = iter(loader)
    if start > 0 and fast_forward_data:
        # replay the loader to its pre-preemption position so the resumed
        # run continues the data stream instead of re-consuming the prefix
        # (loaders are deterministic given their seed)
        for _ in range(start):
            next(it)
    t0 = time.time()
    metrics = None
    for i in range(start, num_steps):
        batch = prepare_batch(next(it))
        if isinstance(batch, tuple):
            state, metrics = step_fn(state, *batch)
        else:
            state, metrics = step_fn(state, batch)
        if (i + 1) % log_every == 0:
            # value fetch, not block_until_ready: the latter is not a sound
            # execution fence on remote backends (benchmarks/_timing.py)
            metrics = {k: float(v) for k, v in metrics.items()}
            rate = (i + 1 - start) / (time.time() - t0)
            logger.log(i + 1, steps_per_s=rate, **metrics)
        if mgr is not None and (i + 1) % checkpoint_every == 0:
            mgr.save(i + 1, state)

    if mgr is not None:
        if metrics is not None:
            float(metrics["loss"])  # drain before the final save
        mgr.save(int(state.step), state)
        mgr.close()
    return state
