"""Tracing, profiling, metrics, and numerics-debug hooks.

The reference library has none of these (SURVEY.md §5: tensorboard/tqdm are
declared deps but never imported). The TPU-native equivalents:

- ``profile_trace``: context manager around ``jax.profiler`` producing a
  TensorBoard-viewable trace of the compiled programs.
- ``named_scope``: annotate transform stacks in profiles/HLO.
- ``MetricLogger``: append-only JSONL scalar logging (host side), cheap
  enough for every-step use.
- ``enable_nan_debugging``: flips jax's debug_nans/debug_infs — the
  race-detector analogue for a deterministic SPMD runtime; data races are
  excluded by construction (pure functions, explicit PRNG), so numerical
  poisoning is the failure class worth instrumenting.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax

__all__ = ["profile_trace", "named_scope", "MetricLogger", "enable_nan_debugging"]


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace viewable in TensorBoard (plugin: profile)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Name a region in profiles/HLO (thin alias of jax.named_scope)."""
    return jax.named_scope(name)


def enable_nan_debugging(enable: bool = True) -> None:
    """Raise on NaN/Inf produced inside jitted code (debug builds only —
    disables some fusions)."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


class MetricLogger:
    """Append-only JSONL scalar logger with wall-clock stamps."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._file = open(path, "a") if path else None
        self._t0 = time.time()
        self.history = []

    def log(self, step: int, **scalars):
        record = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            record[k] = float(v)
        self.history.append(record)
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        return record

    def close(self):
        if self._file:
            self._file.close()
