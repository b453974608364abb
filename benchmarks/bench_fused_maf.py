"""Fused whole-flow MAF kernel vs the XLA chain: ancestral sampling and
log_prob throughput (5x256 d=10 — the BASELINE.md MAF config).

Timing per benchmarks/_timing.py (dispatch -> scalar fetch, fresh inputs).
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.ops.pallas.maf_fused import fuse_maf

    flow = MaskedAutoregressiveFlow(
        features=args.features, hidden_features=args.hidden,
        num_layers=args.layers, num_blocks_per_layer=2,
        key=jax.random.key(0))
    fused = fuse_maf(flow)
    N = args.n
    rng = np.random.default_rng(1)

    z0 = jnp.asarray(rng.normal(size=(4096, args.features)), jnp.float32)
    x_ref, lad_ref = jax.jit(flow.transform.inverse)(z0)
    x_f, lad_f = fused.inverse(z0)
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

    t_xla_inv = timed(lambda z: xla_inv(z), zs)
    t_fus_inv = timed(lambda z: fused.inverse(z), zs)
    t_xla_fwd = timed(lambda z: xla_fwd(z), zs)
    t_fus_fwd = timed(lambda z: fused.forward(z), zs)

    for name, t_x, t_f in (("ancestral sampling (AR inverse)",
                            t_xla_inv, t_fus_inv),
                           ("log_prob (forward)", t_xla_fwd, t_fus_fwd)):
        print(f"{name}: XLA {N/t_x/1e6:.2f} M/s ({t_x*1e3:.1f} ms)  "
              f"fused {N/t_f/1e6:.2f} M/s ({t_f*1e3:.1f} ms)  "
              f"speedup {t_x/t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
