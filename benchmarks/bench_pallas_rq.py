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


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def kernel_bench():
    results = []
    for n in (1 << 14, 1 << 18, 1 << 22):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(scale=2.0, size=(n,)), dtype=jnp.float32)
        w = jnp.asarray(rng.normal(size=(n, K)), dtype=jnp.float32)
        h = jnp.asarray(rng.normal(size=(n, K)), dtype=jnp.float32)
        d = jnp.asarray(rng.normal(size=(n, K - 1)), dtype=jnp.float32)

        for inverse in (False, True):
            xla_fn = jax.jit(lambda x, w, h, d, inv=inverse:
                             unconstrained_rational_quadratic_spline(
                                 x, w, h, d, inverse=inv, tails="linear",
                                 tail_bound=3.0))
            pal_fn = jax.jit(lambda x, w, h, d, inv=inverse:
                             rq_spline_pallas(x, w, h, d, inverse=inv,
                                              tail_bound=3.0))
            t_xla = timeit(xla_fn, x, w, h, d)
            t_pal = timeit(pal_fn, x, w, h, d)
            # correctness spot check
            y0, l0 = xla_fn(x, w, h, d)
            y1, l1 = pal_fn(x, w, h, d)
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
    n = 1 << 16
    out = {}
    for use_pallas in (False, True):
        config.set_pallas_splines(use_pallas)
        fn = jax.jit(lambda f, k: f._sample(k, n, None))
        t = timeit(fn, flow, jax.random.key(1), reps=20)
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
