"""Glow TPU-first layout experiments (round-3 item 10): measure the
img/s effect of (a) the NHWC-internal conv layout and (b) the
scan-stacked per-level step chain, against the round-2 baseline
(NCHW, unrolled: 14.5k img/s log_prob / 8.2k RQ — BASELINE.md).

Usage: python benchmarks/bench_glow_layout.py [--coupling rq]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coupling", default="rq", choices=["affine", "rq"])
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--inner", type=int, default=20,
                   help="chained applications per dispatch")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks._timing import timeit_calls
    from nflows_tpu import config
    from nflows_tpu.models.glow import GlowFlow

    config.set_matmul_precision("bfloat16")
    rng = np.random.default_rng(0)
    init_x = jnp.asarray(rng.normal(size=(64, 3, 32, 32)), jnp.float32)

    def build(stacked):
        # conv_layout="auto": defer to the config.conv_layout() toggle this
        # bench sweeps (GlowFlow's default would otherwise pin the
        # measured-fastest layout per coupling and defeat the A/B)
        flow = GlowFlow(image_shape=(3, 32, 32), num_levels=2,
                        steps_per_level=4, hidden_channels=64,
                        coupling=args.coupling, num_bins=4,
                        key=jax.random.key(0),
                        rng=np.random.default_rng(0), stacked=stacked,
                        conv_layout="auto")
        return flow.initialize_actnorms(init_x)

    def bench(flow, tag):
        # chain `inner` dependent log_prob evaluations so the fixed fetch
        # round-trip amortizes (x re-derived from lp to create the chain)
        def run(x):
            def body(carry, _):
                lp = flow.log_prob(carry)
                carry = carry + (lp.mean() * 0.0)
                return carry, lp.mean()

            _, lps = jax.lax.scan(body, x, None, length=args.inner)
            return lps

        f = jax.jit(run)
        xs = [jnp.asarray(rng.normal(size=(args.batch, 3, 32, 32)),
                          jnp.float32) for _ in range(args.reps + 1)]
        t = timeit_calls(f, [(x,) for x in xs], lambda o: float(o[-1]))
        ips = args.inner * args.batch / t
        print(f"{tag:28s}: {ips:10,.0f} img/s  "
              f"({1e3*t/args.inner:6.2f} ms / {args.batch} imgs)",
              flush=True)
        return ips

    for layout in ("nchw", "nhwc"):
        config.conv_layout(layout)
        for stacked in (False, True):
            bench(build(stacked),
                  f"{layout} {'stacked' if stacked else 'unrolled'}")
    config.conv_layout("nchw")


if __name__ == "__main__":
    main()
