"""Device-only serving time via the chain-slope method.

Round-5 discovery: bench_fused_nsf's single-dispatch timings carry the
~45-50 ms tunnel round-trip un-amortized (its L=1 fused forward measures
51.5 ms vs L=10's 57.4 ms — the 'megakernel cost anatomy' of rounds 2-4
was mostly measuring the tunnel). This bench cancels every fixed cost
exactly, like bench_pallas_rq's slope method: time a jitted chain of k
dependent applications minus a 1-application chain; the difference is
(k-1) x the pure device cost of one application.

Usage: python benchmarks/serve_device_time.py [--k 5] [--packed roll|mm|off]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks._timing import timeit_calls


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=10)
    p.add_argument("--k", type=int, default=5, help="chain length")
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--packed", nargs="?", const="mm", default=None,
                   choices=["mm", "roll", "fat", "off"])
    p.add_argument("--family", choices=["nsf", "maf"], default="nsf",
                   help="maf = AR megakernel (5x256 d=10, the BASELINE "
                        "MAF serving config; inverse is the D-step "
                        "ancestral-sampling fixed point)")
    p.add_argument("--context", type=int, default=0,
                   help="context_features (0 = unconditional): measures "
                        "the conditional serving path device-only")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu import config
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.ops.pallas.nsf_fused import fuse_nsf

    if args.packed:
        config.packed_spline_select(
            False if args.packed == "off" else args.packed)

    ctx_f = args.context or None
    if args.family == "maf":
        from nflows_tpu.flows import MaskedAutoregressiveFlow
        from nflows_tpu.ops.pallas.maf_fused import fuse_maf

        D = 10
        flow = MaskedAutoregressiveFlow(
            features=D, hidden_features=args.hidden, num_layers=5,
            num_blocks_per_layer=2, use_random_permutations=True,
            context_features=ctx_f,
            key=jax.random.key(0), rng=np.random.default_rng(0))
        fused = fuse_maf(flow)
        args.layers = 5
    else:
        D = 6
        flow = NeuralSplineFlow(
            features=D, hidden_features=args.hidden,
            num_layers=args.layers, num_blocks_per_layer=2, num_bins=8,
            tail_bound=3.0, context_features=ctx_f,
            key=jax.random.key(0), rng=np.random.default_rng(0))
        fused = fuse_nsf(flow)
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.normal(size=(args.n, D)), jnp.float32)
          for _ in range(args.reps + 1)]
    x0 = xs[0]

    if ctx_f is not None:
        crng = np.random.default_rng(2)
        ctx = jnp.asarray(crng.normal(size=(args.n, ctx_f)), jnp.float32)
        xla_fwd = jax.jit(lambda v: flow.transform.forward(v, context=ctx))
        xla_inv = jax.jit(lambda v: flow.transform.inverse(v, context=ctx))
        fused_fwd = lambda v: fused.forward(v, context=ctx)
        fused_inv = lambda v: fused.inverse(v, context=ctx)
    else:
        xla_fwd = jax.jit(flow.transform.forward)
        xla_inv = jax.jit(flow.transform.inverse)
        fused_fwd = fused.forward
        fused_inv = fused.inverse

    def chain(f, k):
        @jax.jit
        def run(x):
            lad_acc = jnp.zeros((x.shape[0],), jnp.float32)
            for _ in range(k):
                y, lad = f(x)
                lad_acc = lad_acc + lad
                # rescale keeps the chain in-domain; negligible cost
                x = jnp.clip(y * jnp.float32(0.31), -3.0, 3.0)
            return lad_acc

        return run

    def timed(run, reps):
        # shared fetch-based protocol, fresh inputs per rep
        return timeit_calls(run, [(x,) for x in xs[:reps]] + [(xs[-1],)],
                            lambda o: float(o[0]))

    k = args.k
    print(f"# n={args.n} {args.layers}x{args.hidden}, chain slope k=1 vs "
          f"{k}; per-application DEVICE time:")
    for name, f in [("xla fwd", lambda x: xla_fwd(x)),
                    ("xla inv", lambda x: xla_inv(x)),
                    ("fused fwd", lambda x: fused_fwd(x)),
                    ("fused inv", lambda x: fused_inv(x))]:
        t1 = timed(chain(f, 1), args.reps)
        tk = timed(chain(f, k), args.reps)
        dev_ms = 1e3 * (tk - t1) / (k - 1)
        fixed_ms = 1e3 * t1 - dev_ms
        print(f"{name:10s}: {dev_ms:7.2f} ms/app device "
              f"({1e9*dev_ms*1e-3/args.n/args.layers:5.2f} ns/sample-layer)"
              f" | single-call fixed ~{fixed_ms:5.1f} ms", flush=True)


if __name__ == "__main__":
    main()
