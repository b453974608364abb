"""Fused whole-flow MAF kernel vs the XLA chain: ancestral sampling and
log_prob throughput (5x256 d=10 — the BASELINE.md MAF config).

Timing per benchmarks/_timing.py (dispatch -> scalar fetch, fresh inputs).

NOTE (round 5): single-dispatch WALL times — the ~24 ms tunnel
round-trip is un-amortized and understates the fused speedup
(device-only ratios are ~1.6x larger; see serve_device_time.py
--family maf for the chain-slope numbers).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--features", type=int, default=10)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--context", type=int, default=None,
                   help="context features: benchmark the CONDITIONAL AR "
                        "megakernel (per-layer precomputed context GEMMs)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.ops.pallas.maf_fused import fuse_maf

    if args.context:
        from nflows_tpu.distributions import StandardNormal
        from nflows_tpu.flows.base import Flow
        from nflows_tpu.transforms import (
            CompositeTransform,
            MaskedAffineAutoregressiveTransform,
            RandomPermutation,
        )

        prng = np.random.default_rng(0)
        keys = jax.random.split(jax.random.key(0), args.layers)
        chain = []
        for i in range(args.layers):
            chain.append(RandomPermutation(args.features, rng=prng))
            chain.append(MaskedAffineAutoregressiveTransform(
                features=args.features, hidden_features=args.hidden,
                context_features=args.context, num_blocks=2, key=keys[i]))
        flow = Flow(transform=CompositeTransform(chain),
                    distribution=StandardNormal([args.features]))
    else:
        flow = MaskedAutoregressiveFlow(
            features=args.features, hidden_features=args.hidden,
            num_layers=args.layers, num_blocks_per_layer=2,
            key=jax.random.key(0))
    fused = fuse_maf(flow)
    N = args.n
    rng = np.random.default_rng(1)

    def ctx_for(n):
        if not args.context:
            return None
        return jnp.asarray(rng.normal(size=(n, args.context)), jnp.float32)

    z0 = jnp.asarray(rng.normal(size=(4096, args.features)), jnp.float32)
    c0 = ctx_for(4096)
    x_ref, lad_ref = jax.jit(flow.transform.inverse)(z0, c0)
    x_f, lad_f = fused.inverse(z0, c0)
    # relative error: an UNTRAINED random MAF's inverse reaches ~1e19 (the
    # fixed point amplifies through D features x L layers), so absolute
    # error is meaningless here; fp32 fused shows the same 4e-5 rel err
    rel = float(jnp.max(jnp.abs(x_ref - x_f) / (1.0 + jnp.abs(x_ref))))
    print(f"# numerics: inv out rel err {rel:.2e}, "
          f"lad err {float(jnp.max(jnp.abs(lad_ref-lad_f))):.2e}", flush=True)

    xla_inv = jax.jit(flow.transform.inverse)
    xla_fwd = jax.jit(flow.transform.forward)

    def timed(fn, inputs):
        def drain(out):
            y, lad = out
            return float(y[0, 0]) + float(lad[0])
        drain(fn(inputs[-1]))
        best = float("inf")
        for z in inputs[:-1]:
            t0 = time.perf_counter()
            drain(fn(z))
            best = min(best, time.perf_counter() - t0)
        return best

    zs = [jnp.asarray(rng.normal(size=(N, args.features)), dtype=jnp.float32)
          for _ in range(args.reps + 1)]
    cs = [ctx_for(N) for _ in range(args.reps + 1)]
    zcs = list(zip(zs, cs))

    t_xla_inv = timed(lambda zc: xla_inv(zc[0], zc[1]), zcs)
    t_fus_inv = timed(lambda zc: fused.inverse(zc[0], zc[1]), zcs)
    t_xla_fwd = timed(lambda zc: xla_fwd(zc[0], zc[1]), zcs)
    t_fus_fwd = timed(lambda zc: fused.forward(zc[0], zc[1]), zcs)

    for name, t_x, t_f in (("ancestral sampling (AR inverse)",
                            t_xla_inv, t_fus_inv),
                           ("log_prob (forward)", t_xla_fwd, t_fus_fwd)):
        print(f"{name}: XLA {N/t_x/1e6:.2f} M/s ({t_x*1e3:.1f} ms)  "
              f"fused {N/t_f/1e6:.2f} M/s ({t_f*1e3:.1f} ms)  "
              f"speedup {t_x/t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
