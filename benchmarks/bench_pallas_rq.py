"""Isolated + end-to-end benchmark: fused Pallas RQ-spline kernel vs XLA.

Measures (on the real TPU):
1. kernel-only forward/inverse at several element counts;
2. full NSF sampling throughput (coupling inverse path) with the Pallas
   kernel on vs off.

Usage: python benchmarks/bench_pallas_rq.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nflows_tpu import config
from nflows_tpu.ops.pallas.rq_spline import rq_spline_pallas, pallas_available
from nflows_tpu.ops.splines import unconstrained_rational_quadratic_spline

K = 8


from benchmarks._timing import timeit_calls


def _fetch(out):
    float(jnp.ravel(out[0])[-1])


def timeit(fn, args_list):
    """dispatch -> element-fetch timing on fresh inputs (benchmarks/_timing.py)."""
    return timeit_calls(fn, args_list, _fetch)


def kernel_bench():
    """Per-application kernel time via the slope method: time a jitted chain
    of ITERS dependent applications (output feeds the next input) and a
    1-application chain, and divide the difference — this cancels the fixed
    ~30 ms dispatch/fetch round-trip of the remote backend exactly."""
    results = []
    for n, ITERS in ((1 << 14, 2001), (1 << 18, 301), (1 << 22, 17)):
        def inputs(seed):
            rng = np.random.default_rng(seed)
            return (
                jnp.asarray(rng.normal(scale=2.0, size=(n,)), dtype=jnp.float32),
                jnp.asarray(rng.normal(size=(n, K)), dtype=jnp.float32),
                jnp.asarray(rng.normal(size=(n, K)), dtype=jnp.float32),
                jnp.asarray(rng.normal(size=(n, K - 1)), dtype=jnp.float32),
            )
        args_list = [inputs(i) for i in range(4)]  # last = warmup
        x, w, h, d = args_list[0]

        for inverse in (False, True):
            def make_chain(core, iters):
                def chained(x, w, h, d):
                    def body(_, carry):
                        y, acc = carry
                        y2, lad = core(y, w, h, d)
                        return y2, acc + lad
                    return jax.lax.fori_loop(
                        0, iters, body, (x, jnp.zeros_like(x)))
                return jax.jit(chained)

            xla_core = lambda x, w, h, d, inv=inverse: (
                unconstrained_rational_quadratic_spline(
                    x, w, h, d, inverse=inv, tails="linear", tail_bound=3.0))
            pal_core = lambda x, w, h, d, inv=inverse: (
                rq_spline_pallas(x, w, h, d, inverse=inv, tail_bound=3.0))

            def per_iter(core):
                t1 = timeit(make_chain(core, 1), args_list)
                tk = timeit(make_chain(core, ITERS), args_list)
                return (tk - t1) / (ITERS - 1)

            t_xla = per_iter(xla_core)
            t_pal = per_iter(pal_core)
            y0, l0 = jax.jit(xla_core)(x, w, h, d)
            y1, l1 = jax.jit(pal_core)(x, w, h, d)
            err = float(jnp.max(jnp.abs(y0 - y1)))
            results.append({
                "n": n, "inverse": inverse,
                "xla_us": round(t_xla * 1e6, 1),
                "pallas_us": round(t_pal * 1e6, 1),
                "speedup": round(t_xla / t_pal, 2),
                "max_err": err,
            })
    return results


def sampling_bench():
    from nflows_tpu.models import NeuralSplineFlow

    flow = NeuralSplineFlow(
        features=6, hidden_features=256, num_layers=10,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0),
    )
    n = 1 << 18
    out = {}
    for use_pallas in (False, True):
        config.set_pallas_splines(use_pallas)
        fn = jax.jit(lambda f, k: f._sample(k, n, None))
        keys = [(flow, jax.random.key(i)) for i in range(4)]  # last = warmup
        t = timeit(fn, keys)
        out["pallas" if use_pallas else "xla"] = round(n / t / 1e6, 2)
    config.set_pallas_splines(False)
    out["speedup"] = round(out["pallas"] / out["xla"], 2)
    return out


def main():
    assert pallas_available(), "needs the TPU backend"
    print(json.dumps({
        "kernel": kernel_bench(),
        "sampling_Msamples_per_s_65k_batch": sampling_bench(),
    }, indent=2))


if __name__ == "__main__":
    main()
