"""Trained-to-convergence NLL parity at realistic dimensionality (d=8, 21).

Round-1 VERDICT item 4: moons (2-D) parity was proven; the NSF benchmark
suite's raison d'etre is 8-63-dim density estimation. Real UCI data is not
redistributable (and this image has no egress), so both libraries train on
IDENTICAL draws from a synthetic mid-dim Gaussian-mixture target (fixed
seed, standardized), with the same architecture (RQ-NSF coupling, the NSF
paper family: alternating-mask couplings + permutations), same Adam
schedule and minibatch stream, and are compared on held-out test NLL.

Usage:
  python benchmarks/parity_middim.py --impl ref  --dim 8   # torch CPU
  python benchmarks/parity_middim.py --impl ours --dim 8   # TPU
  python benchmarks/parity_middim.py --impl ours --dim 8 --seed 1 ...
Each run appends one JSON line to benchmarks/parity_middim_results.jsonl.
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")  # repo root
REFERENCE_PATH = "/root/reference"

HIDDEN, LAYERS, BLOCKS, BINS, TAIL = 128, 5, 2, 8, 3.0
BATCH, STEPS, LR = 512, 5000, 5e-4
N_TRAIN, N_TEST = 50_000, 10_000


def make_gmm_data(dim, seed=0):
    """Fixed 4-component full-covariance-ish GMM, standardized.

    The per-sample ``multivariate_normal`` loop re-factorizes a dim x dim
    covariance 60k times (minutes at d=63 on this 1-core host), and every
    (impl, seed) process regenerates the SAME arrays — so cache to disk.
    The cache only memoizes; the draws are byte-identical to a cold run.
    """
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_gmm_cache", f"gmm_d{dim}_s{seed}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["Xtr"], z["Xte"]
    rng = np.random.default_rng(seed)
    K = 4
    means = rng.normal(size=(K, dim)) * 2.0
    # random SPD-ish scales via low-rank + diag
    scales = []
    for k in range(K):
        A = rng.normal(size=(dim, dim)) * 0.3
        scales.append(A @ A.T * 0.2 + np.eye(dim) * 0.3)
    comp = rng.integers(0, K, N_TRAIN + N_TEST)
    X = np.stack([
        rng.multivariate_normal(means[c], scales[c]) for c in comp
    ]).astype(np.float32)
    mu, sd = X[:N_TRAIN].mean(0), X[:N_TRAIN].std(0)
    X = (X - mu) / sd
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, Xtr=X[:N_TRAIN], Xte=X[N_TRAIN:])
    return X[:N_TRAIN], X[N_TRAIN:]


def minibatch_stream(n, seed):
    rng = np.random.default_rng(seed + 10_000)
    while True:
        yield rng.integers(0, n, BATCH)


def run_ours(Xtr, Xte, dim, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    flow = NeuralSplineFlow(
        features=dim, hidden_features=HIDDEN, num_layers=LAYERS,
        num_blocks_per_layer=BLOCKS, num_bins=BINS, tail_bound=TAIL,
        key=jax.random.key(seed), rng=np.random.default_rng(seed),
        use_random_permutations=True, stacked=True)  # odd d stacks (round 3)
    opt = optax.adam(LR)
    state = create_train_state(flow, opt)
    steps_fn = make_scan_train_step(opt)

    stream = minibatch_stream(len(Xtr), seed)
    t0 = time.time()
    window = 500
    for start in range(0, STEPS, window):
        idx = np.stack([next(stream) for _ in range(window)])
        batches = jnp.asarray(Xtr[idx])
        state, losses = steps_fn(state, batches)
    final_train = float(losses[-1])
    train_s = time.time() - t0

    flow = state.flow
    lp = []
    for i in range(0, len(Xte), 5000):
        lp.append(np.asarray(flow.log_prob(jnp.asarray(Xte[i:i + 5000]))))
    test_nll = float(-np.concatenate(lp).mean())
    return test_nll, final_train, train_s


def run_ref(Xtr, Xte, dim, seed):
    import torch

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "UMNN" not in sys.modules:
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub

    torch.manual_seed(seed)
    torch.set_num_threads(8)

    from nflows.distributions import StandardNormal
    from nflows.flows.base import Flow
    from nflows.nn import nets
    from nflows.transforms import (
        CompositeTransform,
        PiecewiseRationalQuadraticCouplingTransform,
        RandomPermutation,
    )
    from nflows.utils import create_alternating_binary_mask

    def create_net(i, o):
        return nets.ResidualNet(i, o, hidden_features=HIDDEN,
                                num_blocks=BLOCKS)

    layers = []
    for i in range(LAYERS):
        layers.append(RandomPermutation(features=dim))
        layers.append(PiecewiseRationalQuadraticCouplingTransform(
            mask=create_alternating_binary_mask(dim, even=bool(i % 2)),
            transform_net_create_fn=create_net,
            num_bins=BINS, tails="linear", tail_bound=TAIL))
    flow = Flow(CompositeTransform(layers), StandardNormal([dim]))
    optimizer = torch.optim.Adam(flow.parameters(), lr=LR)

    Xtr_t = torch.tensor(Xtr)
    stream = minibatch_stream(len(Xtr), seed)
    t0 = time.time()
    for step in range(STEPS):
        idx = next(stream)
        loss = -flow.log_prob(Xtr_t[idx]).mean()
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
    train_s = time.time() - t0

    with torch.no_grad():
        lp = []
        for i in range(0, len(Xte), 5000):
            lp.append(flow.log_prob(torch.tensor(Xte[i:i + 5000])).numpy())
    test_nll = float(-np.concatenate(lp).mean())
    return test_nll, float(loss), train_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", choices=["ours", "ref"], required=True)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    Xtr, Xte = make_gmm_data(args.dim)
    fn = run_ours if args.impl == "ours" else run_ref
    test_nll, final_train, train_s = fn(Xtr, Xte, args.dim, args.seed)
    rec = {"impl": args.impl, "dim": args.dim, "seed": args.seed,
           "test_nll": round(test_nll, 4),
           "final_train_loss": round(final_train, 4),
           "train_seconds": round(train_s, 1),
           "config": f"h{HIDDEN}xL{LAYERS}xB{BLOCKS}xK{BINS} "
                     f"batch{BATCH} steps{STEPS} lr{LR}"}
    out = os.path.join(os.path.dirname(__file__), "parity_middim_results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
