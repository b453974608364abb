"""Observability subsystem tests (SURVEY.md §5: tracing/metrics/nan-debug —
all absent in the reference)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.utils.observability import (
    MetricLogger,
    enable_nan_debugging,
    named_scope,
    profile_trace,
)


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    logger = MetricLogger(path)
    logger.log(1, loss=2.5)
    logger.log(2, loss=jnp.asarray(1.25), lr=1e-3)
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in lines] == [1, 2]
    assert lines[1]["loss"] == 1.25 and lines[1]["lr"] == 1e-3
    assert all("wall_s" in r for r in lines)
    assert len(logger.history) == 2


def test_named_scope_in_jit():
    @jax.jit
    def fn(x):
        with named_scope("coupling_layer"):
            return x * 2
    assert float(fn(jnp.asarray(3.0))) == 6.0


def test_profile_trace_writes(tmp_path):
    logdir = str(tmp_path / "trace")
    with profile_trace(logdir):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    # a plugins/profile/<run>/ directory with trace artifacts appears
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler wrote no trace files"


def test_enable_nan_debugging_raises_and_restores():
    enable_nan_debugging(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    finally:
        enable_nan_debugging(False)
    # back to NaN-propagation semantics
    out = jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))
    assert np.isnan(float(out))
