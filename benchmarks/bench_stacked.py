"""Stacked (lax.scan over layers) vs unrolled NSF: training throughput and
compile time at the headline config (features=6, hidden=256, 10 layers,
batch 512, bf16 MXU).

The stacked path compiles one conditioner body instead of 10 — this script
measures what that does to (a) scan-fused training steps/s, (b) jit compile
wall time, on the real TPU.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=10)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--inner", type=int, default=1000)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    FEATURES, BINS = 6, 8
    rng = np.random.default_rng(1)
    windows = [
        jnp.asarray(rng.normal(size=(args.inner, args.batch, FEATURES)),
                    dtype=jnp.float32)
        for _ in range(args.reps + 1)
    ]

    for stacked in (False, True):
        flow = NeuralSplineFlow(
            features=FEATURES, hidden_features=args.hidden,
            num_layers=args.layers, num_blocks_per_layer=2, num_bins=BINS,
            tail_bound=3.0, key=jax.random.key(0),
            rng=np.random.default_rng(0), stacked=stacked)
        optimizer = optax.adam(3e-4)
        state = create_train_state(flow, optimizer)
        steps = make_scan_train_step(optimizer)

        t0 = time.perf_counter()
        state, losses = steps(state, windows[-1])
        float(losses[-1])
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for i in range(args.reps):
            state, losses = steps(state, windows[i])
        float(losses[-1])
        dt = time.perf_counter() - t0
        sps = args.reps * args.inner / dt
        print(f"stacked={stacked}: {sps:,.0f} steps/s "
              f"({1e6/sps:.0f} us/step), compile+first-window {compile_s:.1f}s", flush=True)


if __name__ == "__main__":
    main()
