"""MXU utilization at wide conditioners: hidden=512 batch sweep.

Round-1 VERDICT item 1: hidden=512 at batch 512 measured 55.6 TFLOPS
(~28% of the 197-TFLOPS bf16 MXU peak) — the GEMMs are too small. This
sweeps per-step batch at hidden=512 to find the batch where utilization
crosses 45%, with training-step FLOPs computed from the model shapes
(fwd + ~2x bwd = 3x forward FLOPs).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root

BF16_PEAK_TFLOPS = 197.0  # TPU v5e per-chip bf16


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=10)
    p.add_argument("--batches", type=int, nargs="+",
                   default=[512, 1024, 2048, 4096, 8192])
    p.add_argument("--inner", type=int, default=300)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    D, BINS = 6, 8
    H, L = args.hidden, args.layers
    Tid, T = D // 2, D // 2
    out = T * (3 * BINS - 1)
    fwd_macs_per_sample = L * (Tid * H + 4 * H * H + H * out)

    opt = optax.adam(3e-4)
    steps = make_scan_train_step(opt)

    rng = np.random.default_rng(1)
    for batch in args.batches:
        # fresh flow per config: the scan step DONATES the state, so the
        # previous round's arrays (shared via create_train_state) are gone
        flow = NeuralSplineFlow(
            features=D, hidden_features=H, num_layers=L,
            num_blocks_per_layer=2, num_bins=BINS, tail_bound=3.0,
            key=jax.random.key(0), rng=np.random.default_rng(0),
            stacked=True)
        state = create_train_state(flow, opt)
        windows = [jnp.asarray(rng.normal(size=(args.inner, batch, D)),
                               dtype=jnp.float32) for _ in range(4)]
        state, losses = steps(state, windows[-1])
        float(losses[-1])
        best = float("inf")
        for w in windows[:-1]:
            t0 = time.perf_counter()
            state, losses = steps(state, w)
            float(losses[-1])
            best = min(best, time.perf_counter() - t0)
        us_step = best / args.inner * 1e6
        # training step ~= 3x forward FLOPs (fwd + dgrad + wgrad)
        tflops = 3 * 2 * batch * fwd_macs_per_sample / (best / args.inner) / 1e12
        print(f"hidden={H} batch={batch:5d}: {args.inner/best:7,.0f} steps/s "
              f"({us_step:6.0f} us/step)  {tflops:6.1f} TFLOPS "
              f"= {100*tflops/BF16_PEAK_TFLOPS:4.1f}% MXU", flush=True)


if __name__ == "__main__":
    main()
