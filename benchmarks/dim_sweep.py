"""Training-throughput sweep over feature dimensionality — chasing the
round-1 GAS anomaly (BASELINE.md: d=8 at 2,156 steps/s was SLOWER than
d=21 at 2,782 with identical width).

Sweeps d at the flagship config (hidden 256, 10 layers, 2 blocks, 8 bins,
batch 512), scan-fused train loop, bf16 MXU; also isolates whether the
anomaly tracks the coupling split (d/2 conditioner input/output widths) or
the permutation gathers by re-running d=8 with reverse (non-random)
permutations.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root


def bench_dim(dim, *, stacked, random_perms, inner=500, reps=3):
    import jax
    import jax.numpy as jnp
    import optax

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    flow = NeuralSplineFlow(
        features=dim, hidden_features=256, num_layers=10,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0),
        use_random_permutations=random_perms, stacked=stacked)
    opt = optax.adam(3e-4)
    state = create_train_state(flow, opt)
    steps = make_scan_train_step(opt)

    rng = np.random.default_rng(1)
    windows = [jnp.asarray(rng.normal(size=(inner, 512, dim)),
                           dtype=jnp.float32) for _ in range(reps + 1)]
    state, losses = steps(state, windows[-1])
    float(losses[-1])
    best = float("inf")
    for w in windows[:-1]:
        t0 = time.perf_counter()
        state, losses = steps(state, w)
        float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    return inner / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", type=int, nargs="+",
                   default=[6, 8, 10, 12, 16, 21])
    args = p.parse_args()

    import jax
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    for d in args.dims:
        sps_u = bench_dim(d, stacked=False, random_perms=True)
        sps_s = bench_dim(d, stacked=True, random_perms=True)
        print(f"d={d:3d}: unrolled {sps_u:7,.0f} steps/s"
              f"   stacked {sps_s:7,.0f} steps/s",
              flush=True)
    # permutation-type probe at the anomalous dim
    sps_rand = bench_dim(8, stacked=False, random_perms=True)
    sps_rev = bench_dim(8, stacked=False, random_perms=False)
    print(f"d=8 random perms {sps_rand:,.0f} vs reverse perms "
          f"{sps_rev:,.0f} steps/s", flush=True)


if __name__ == "__main__":
    main()
