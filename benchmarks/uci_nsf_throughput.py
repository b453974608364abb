"""UCI-config NSF training throughput: nflows_tpu (TPU) vs reference (CPU).

Runs the flagship RQ-NSF coupling architecture (hidden 256, 10 coupling
layers, 2 residual blocks, 8 bins, batch 512 — bench.py's config) at the
feature dimensionality of each NSF-paper UCI dataset (arXiv 1906.04032
Table 1): POWER d=6, GAS d=8, HEPMASS d=21, MINIBOONE d=43, BSDS300 d=63.

The datasets themselves are not redistributable (and this image has no
egress), so data is synthetic standard-normal — throughput depends only on
shapes. NLL parity is covered separately: weight-transplant parity tests
(tests/parity/) + measured moons convergence (benchmarks/parity_moons.py).

Ours is measured as the production scan-fused train loop (500-step scan
windows, dispatch→value-fetch timing per benchmarks/_timing.py); the
reference is its only execution path (eager torch, CPU, 8 threads).

Usage: python benchmarks/uci_nsf_throughput.py [--skip-reference]
"""

import argparse
import json
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")

DATASETS = {"POWER": 6, "GAS": 8, "HEPMASS": 21, "MINIBOONE": 43, "BSDS300": 63}
HIDDEN, LAYERS, BLOCKS, BINS, BATCH = 256, 10, 2, 8, 512


def run_ours(features):
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    flow = NeuralSplineFlow(
        features=features, hidden_features=HIDDEN, num_layers=LAYERS,
        num_blocks_per_layer=BLOCKS, num_bins=BINS, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0),
        # scan-stacked production path for ALL dims (odd dims use the
        # fixed ceil/floor split since round 3); also sidesteps the
        # unrolled chain's permutation-gather pathology at d=8
        # (benchmarks/dim_sweep.py: d=8 unrolled 2,303 vs stacked 3,406)
        stacked=True,
    )
    opt = optax.adam(3e-4)
    state = create_train_state(flow, opt)
    steps = make_scan_train_step(opt)

    INNER, OUTER = 500, 4
    rng = np.random.default_rng(1)
    windows = [jnp.asarray(rng.normal(size=(INNER, BATCH, features)),
                           dtype=jnp.float32) for _ in range(OUTER + 1)]
    state, losses = steps(state, windows[-1])
    float(losses[-1])  # value fetch = the only sound fence (benchmarks/_timing.py)
    t0 = time.perf_counter()
    for i in range(OUTER):
        state, losses = steps(state, windows[i])
    float(losses[-1])
    return OUTER * INNER / (time.perf_counter() - t0)


def build_reference_nsf(features):
    """The flagship RQ-NSF coupling architecture, built from the reference's
    own components (shared with benchmarks/sampling_throughput.py so the
    two benchmarks can never diverge)."""
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "UMNN" not in sys.modules:
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub

    from nflows import transforms
    from nflows.distributions import StandardNormal
    from nflows.flows import Flow
    from nflows.nn import nets

    torch.manual_seed(0)
    torch.set_num_threads(8)

    def create_net(in_f, out_f):
        return nets.ResidualNet(in_f, out_f, hidden_features=HIDDEN,
                                num_blocks=BLOCKS)

    layers = []
    for i in range(LAYERS):
        layers.append(transforms.RandomPermutation(features=features))
        mask = ((np.arange(features) + i) % 2 * 2 - 1).tolist()
        layers.append(transforms.PiecewiseRationalQuadraticCouplingTransform(
            mask=mask, transform_net_create_fn=create_net,
            num_bins=BINS, tails="linear", tail_bound=3.0))
    return Flow(transforms.CompositeTransform(layers), StandardNormal([features]))


def run_reference(features, steps=12):
    import torch

    flow = build_reference_nsf(features)
    opt = torch.optim.Adam(flow.parameters(), lr=3e-4)
    x = torch.randn(BATCH, features)

    for _ in range(3):  # warmup
        opt.zero_grad(); (-flow.log_prob(x).mean()).backward(); opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad(); (-flow.log_prob(x).mean()).backward(); opt.step()
    return steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    rows = []
    for name, d in DATASETS.items():
        ours = run_ours(d)
        ref = None if args.skip_reference else run_reference(d)
        rows.append({
            "dataset": name, "features": d,
            "nflows_tpu_steps_per_s": round(ours, 1),
            "reference_steps_per_s": round(ref, 2) if ref else None,
            "speedup": round(ours / ref, 0) if ref else None,
        })
        print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
