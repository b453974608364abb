"""Fused MADEMoG log_prob vs the XLA path (d=10, K=10, hidden 256 — a
typical neural-density-estimation config).

Timing per benchmarks/_timing.py rules (dispatch -> scalar fetch, fresh
inputs per rep).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--features", type=int, default=10)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--components", type=int, default=10)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu.nn.nde.made import MixtureOfGaussiansMADE
    from nflows_tpu.ops.pallas.mademog_fused import fuse_mademog

    made = MixtureOfGaussiansMADE(
        features=args.features, hidden_features=args.hidden, num_blocks=2,
        num_mixture_components=args.components, key=jax.random.key(0),
        rng=np.random.default_rng(0))
    fused = fuse_mademog(made)
    xla = jax.jit(made.log_prob)

    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(4096, args.features)), jnp.float32)
    err = float(jnp.max(jnp.abs(fused.log_prob(x0) - xla(x0))))
    print(f"# numerics: log_prob max err {err:.2e} (bf16 GEMMs)",
          flush=True)

    from benchmarks._timing import timeit_calls

    xs = [(jnp.asarray(rng.normal(size=(args.n, args.features)),
                       jnp.float32),)
          for _ in range(args.reps + 1)]

    def drain(out):
        return float(out[0])

    t_x = timeit_calls(xla, xs, drain)
    t_f = timeit_calls(fused.log_prob, xs, drain)
    print(f"log_prob: XLA {args.n/t_x/1e6:.2f} M/s ({t_x*1e3:.1f} ms)  "
          f"fused {args.n/t_f/1e6:.2f} M/s ({t_f*1e3:.1f} ms)  "
          f"speedup {t_x/t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
