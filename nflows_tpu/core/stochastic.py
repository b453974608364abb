"""Ambient PRNG context for stochastic layers (dropout) under jit.

The reference toggles dropout with torch's global train/eval mode; JAX needs
an explicit key. Rather than threading a ``key`` kwarg through every
``forward(inputs, context)`` in the library, stochastic layers pull keys
from an ambient context entered *inside* the traced function::

    def loss_fn(params, batch, key):
        flow = combine(params, rest)
        with stochastic(key):              # key is a tracer — fine
            return -flow.log_prob(batch).mean()

Each draw folds a fresh per-call counter into the context key, so every
dropout site gets an independent stream; the counter is Python-level trace
state (resets each trace), so the compiled program takes the key as an
argument and stays cacheable. No context (the default) = eval behavior.
"""

from __future__ import annotations

import contextlib
import threading

import jax

__all__ = ["stochastic", "next_rng_key", "has_stochastic_context"]

_local = threading.local()


def _stack():
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


@contextlib.contextmanager
def stochastic(key):
    """Provide a PRNG key to all stochastic layers in the dynamic scope."""
    frame = {"key": key, "counter": 0}
    _stack().append(frame)
    try:
        yield
    finally:
        _stack().pop()


def has_stochastic_context() -> bool:
    return bool(_stack())


def next_rng_key():
    """A fresh key from the innermost context, or None outside any context."""
    stack = _stack()
    if not stack:
        return None
    frame = stack[-1]
    base = frame["key"]
    if not isinstance(base, jax.core.Tracer) and not _trace_state_clean():
        # `with stochastic(key):` was entered OUTSIDE the jitted function but
        # a dropout draw is happening INSIDE a trace: the concrete key would
        # be baked into the compiled program as a constant and every cached
        # call would reuse the same dropout masks.
        raise RuntimeError(
            "stochastic(key) was entered outside the traced function; the "
            "key would be baked into the compiled program as a constant. "
            "Enter the context inside the jitted function (pass the key as "
            "an argument), e.g. make_train_step(...)(state, batch, key=key)."
        )
    key = jax.random.fold_in(base, frame["counter"])
    frame["counter"] += 1
    return key


def _trace_state_clean() -> bool:
    try:
        from jax._src import core as _core
        return bool(_core.trace_state_clean())
    except Exception:
        return True  # internal API moved: skip the footgun check
