"""Fetch-based timing protocol for the remote ('axon') TPU backend.

Measured pitfall (2026-08-16, this image): ``jax.block_until_ready`` on a
freshly dispatched computation can return in ~3 ms even when the true
device execution takes hundreds of ms — dispatch is lazy/asynchronous
through the remote tunnel and only a *value materialization* (e.g.
``float(x)`` / ``np.asarray(x)``) reliably spans the full execution. A
naive block-based timer can therefore over-report throughput by 5-20x.

Protocol (every benchmark in this directory goes through these helpers):

1. time ``dispatch -> scalar fetch`` of a value that data-depends on the
   whole computation;
2. use fresh inputs for every timed call — including the first timed call
   after warmup (identical re-dispatches can be serviced anomalously fast,
   and a min-over-reps timer would keep exactly that anomaly);
3. amortize the fixed fetch/round-trip latency (~30-60 ms here) by making
   each timed call large (long ``lax.scan`` windows / big batches), or
   cancel it exactly with the slope method (time a k-chain and a 1-chain
   of dependent applications and divide the difference by k-1 — see
   bench_pallas_rq.py).
"""

import time

__all__ = ["timeit_calls", "rate"]


def timeit_calls(fn, args_list, fetch):
    """min over fresh-input reps of (dispatch -> scalar fetch) wall time, s.

    ``args_list`` must hold >= 2 distinct argument tuples: the LAST entry
    is consumed by the untimed warmup (compile + drain) and every other
    entry is one timed rep, so no timed call ever re-dispatches an input
    the backend has already seen.
    """
    if len(args_list) < 2:
        raise ValueError("need >= 2 distinct inputs (last one is warmup)")
    fetch(fn(*args_list[-1]))  # compile + drain
    best = float("inf")
    for args in args_list[:-1]:
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best


def rate(fn, args_list, fetch, items):
    """items per second, timed per :func:`timeit_calls`."""
    return items / timeit_calls(fn, args_list, fetch)
