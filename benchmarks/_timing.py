"""Fetch-based timing protocol for the remote ('axon') TPU backend.

Measured pitfall (2026-08-16, this image): ``jax.block_until_ready`` on a
freshly dispatched computation can return in ~3 ms even when the true
device execution takes hundreds of ms — dispatch is lazy/asynchronous
through the remote tunnel and only a *value materialization* (e.g.
``float(x)`` / ``np.asarray(x)``) reliably spans the full execution. A
naive block-based timer can therefore over-report throughput by 20x+.

Protocol used by every benchmark in this directory:

1. time ``dispatch -> scalar fetch`` of a value that data-depends on the
   whole computation;
2. use fresh inputs for every timed call (identical re-dispatches can be
   serviced anomalously fast);
3. amortize the fixed fetch/round-trip latency (~30-60 ms here) by making
   each timed call large (long ``lax.scan`` windows / big batches), and
   report the per-item slope, not a small-call quotient.
"""

import time

import numpy as np

__all__ = ["timed_fetch"]


def timed_fetch(dispatch, fetch=None, reps=3):
    """min over reps of (dispatch() -> scalar fetch) wall time, seconds.

    ``dispatch()`` must launch the computation on fresh inputs and return
    the output; ``fetch(out)`` must materialize a scalar depending on it
    (default: ``float(jnp.ravel(out)[-1])`` semantics via np.asarray).
    """
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = dispatch()
        if fetch is not None:
            fetch(out)
        else:
            np.asarray(out)  # full materialization
        best = min(best, time.perf_counter() - t0)
    return best
