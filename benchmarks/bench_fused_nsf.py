"""Fused whole-flow Pallas kernel vs the XLA chain: NSF sampling and
log_prob throughput on the flagship 10x256 d=6 RQ-NSF.

Timing per benchmarks/_timing.py: dispatch -> scalar fetch of a value that
data-depends on the whole computation, fresh inputs per rep.

NOTE (round 5): these are single-dispatch WALL times — they include the
~24 ms tunnel round-trip un-amortized, which understates the fused
speedup (measures 1.4-1.9x where the device-only ratio is 4.2-4.9x) and
drowns style-level (fat/roll/mm) differences in latency noise. For
device-only numbers and style A/Bs use benchmarks/serve_device_time.py
(chain-slope method). Kept because wall latency through this tunnel IS
what a single remote call costs end to end.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=10)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--context", type=int, default=0,
                   help="context_features (0 = unconditional); measures "
                        "the round-3 conditional fused path")
    p.add_argument("--packed", nargs="?", const="mm", default=None,
                   choices=["mm", "roll", "fat", "off"],
                   help="use the packed-sublane spline stage "
                        "(config.packed_spline_select) in the megakernel: "
                        "'mm' = kron matmul form, 'roll' = pltpu roll/"
                        "repeat structural moves (round 5)")
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
    flow = NeuralSplineFlow(
        features=6, hidden_features=args.hidden, num_layers=args.layers,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        context_features=ctx_f,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    fused = fuse_nsf(flow)  # bf16 conditioner GEMMs, like training
    N = args.n
    rng = np.random.default_rng(1)

    if ctx_f is not None:
        # conditional serving endpoints: context rides the lanes in the
        # megakernel (one extra stationary GEMM per block); XLA baseline
        # is the jitted Flow endpoint on the same shapes
        c0 = jnp.asarray(rng.normal(size=(4096, ctx_f)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(4096, 6)), jnp.float32)
        lp_ref = jax.jit(flow.log_prob)(x0, c0)
        lp_f = fused.log_prob(x0, c0)
        print(f"# conditional numerics: log_prob err "
              f"{float(jnp.max(jnp.abs(lp_ref - lp_f))):.2e}", flush=True)

        xla_lp = jax.jit(flow.log_prob)

        def timed_lp(fn, pairs):
            def drain(out):
                return float(out[0])
            drain(fn(*pairs[-1]))
            best = float("inf")
            for xc in pairs[:-1]:
                t0 = time.perf_counter()
                drain(fn(*xc))
                best = min(best, time.perf_counter() - t0)
            return best

        pairs = [
            (jnp.asarray(rng.normal(size=(N, 6)), jnp.float32),
             jnp.asarray(rng.normal(size=(N, ctx_f)), jnp.float32))
            for _ in range(args.reps + 1)
        ]
        t_x = timed_lp(lambda x, c: xla_lp(x, c), pairs)
        t_f = timed_lp(lambda x, c: fused.log_prob(x, c), pairs)
        print(f"conditional log_prob (ctx={ctx_f}): "
              f"XLA {N/t_x/1e6:.2f} M/s ({t_x*1e3:.1f} ms)  "
              f"fused {N/t_f/1e6:.2f} M/s ({t_f*1e3:.1f} ms)  "
              f"speedup {t_x/t_f:.2f}x", flush=True)

        # conditional sampling: C contexts x S samples each
        C, S = 2048, max(1, N // 2048)
        xla_sample = jax.jit(
            lambda k, c: flow.sample(k, S, context=c))

        def timed_s(fn):
            def drain(out):
                return float(out[0, 0, 0])
            keys = jax.random.split(jax.random.key(7), args.reps + 1)
            ctxs = [jnp.asarray(rng.normal(size=(C, ctx_f)), jnp.float32)
                    for _ in range(args.reps + 1)]
            drain(fn(keys[-1], ctxs[-1]))
            best = float("inf")
            for k, c in zip(keys[:-1], ctxs[:-1]):
                t0 = time.perf_counter()
                drain(fn(k, c))
                best = min(best, time.perf_counter() - t0)
            return best

        t_xs = timed_s(lambda k, c: xla_sample(k, c))
        fused_s = fused.with_lanes(2048) if C * S > 4096 else fused
        t_fs = timed_s(lambda k, c: fused_s.sample(k, S, context=c))
        n_s = C * S
        print(f"conditional sample ({C} ctx x {S}): "
              f"XLA {n_s/t_xs/1e6:.2f} M/s ({t_xs*1e3:.1f} ms)  "
              f"fused {n_s/t_fs/1e6:.2f} M/s ({t_fs*1e3:.1f} ms)  "
              f"speedup {t_xs/t_fs:.2f}x", flush=True)
        return

    # bf16-vs-fp32 numeric check on this hardware before timing
    z0 = jnp.asarray(rng.normal(size=(4096, 6)), dtype=jnp.float32)
    x_ref, lad_ref = jax.jit(flow.transform.inverse)(z0)
    x_f, lad_f = fused.inverse(z0)
    print(f"# numerics: inv out err {float(jnp.max(jnp.abs(x_ref-x_f))):.2e}, "
          f"lad err {float(jnp.max(jnp.abs(lad_ref-lad_f))):.2e}", flush=True)

    xla_inv = jax.jit(flow.transform.inverse)
    xla_fwd = jax.jit(flow.transform.forward)

    def timed(fn, inputs):
        # warmup on last input, then min over fresh-input reps; fetch
        # scalars from BOTH outputs so the timer spans the full execution
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

    zs = [jnp.asarray(rng.normal(size=(N, 6)), dtype=jnp.float32)
          for _ in range(args.reps + 1)]

    t_xla_inv = timed(lambda z: xla_inv(z), zs)
    t_fus_inv = timed(lambda z: fused.inverse(z), zs)
    t_xla_fwd = timed(lambda z: xla_fwd(z), zs)
    t_fus_fwd = timed(lambda z: fused.forward(z), zs)

    for name, t_x, t_f in (("inverse/sampling", t_xla_inv, t_fus_inv),
                           ("forward/log_prob", t_xla_fwd, t_fus_fwd)):
        print(f"{name}: XLA {N/t_x/1e6:.2f} M/s ({t_x*1e3:.1f} ms)  "
              f"fused {N/t_f/1e6:.2f} M/s ({t_f*1e3:.1f} ms)  "
              f"speedup {t_x/t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
