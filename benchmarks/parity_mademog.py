"""Trained-to-convergence NLL parity for the mixture-density family.

Extends the parity suite (parity_middim.py: RQ-NSF couplings at d=8-63,
parity_image.py: multiscale Glow) to a SECOND model class: MADEMoG —
one masked MADE + per-feature mixture-of-Gaussians head (reference
nflows/distributions/mixture.py + nflows/nn/nde/made.py:284-354). Both
implementations train on IDENTICAL draws from the d=8 synthetic GMM
target (parity_middim.make_gmm_data, fixed seed, standardized), same
architecture/Adam schedule/minibatch stream, compared on held-out NLL.

Usage:
  python benchmarks/parity_mademog.py --impl ref            # torch CPU
  python benchmarks/parity_mademog.py --impl ours --seed 1  # TPU/CPU
Each run appends one JSON line to benchmarks/parity_mademog_results.jsonl.
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

from benchmarks.parity_middim import make_gmm_data, minibatch_stream  # noqa: E402

DIM, HIDDEN, BLOCKS, COMPONENTS = 8, 128, 2, 8
BATCH, STEPS, LR = 512, 5000, 5e-4


def run_ours(Xtr, Xte, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from nflows_tpu.distributions import MADEMoG
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    dist = MADEMoG(features=DIM, hidden_features=HIDDEN,
                   context_features=None, num_blocks=BLOCKS,
                   num_mixture_components=COMPONENTS,
                   key=jax.random.key(seed), rng=np.random.default_rng(seed))
    opt = optax.adam(LR)
    state = create_train_state(dist, opt)
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

    dist = state.flow
    lp = []
    for i in range(0, len(Xte), 5000):
        lp.append(np.asarray(dist.log_prob(jnp.asarray(Xte[i:i + 5000]))))
    test_nll = float(-np.concatenate(lp).mean())
    return test_nll, final_train, train_s


def run_ref(Xtr, Xte, seed):
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

    from nflows.distributions.mixture import MADEMoG

    dist = MADEMoG(features=DIM, hidden_features=HIDDEN,
                   context_features=None, num_blocks=BLOCKS,
                   num_mixture_components=COMPONENTS)
    optimizer = torch.optim.Adam(dist.parameters(), lr=LR)

    Xtr_t = torch.tensor(Xtr)
    stream = minibatch_stream(len(Xtr), seed)
    t0 = time.time()
    for step in range(STEPS):
        idx = next(stream)
        loss = -dist.log_prob(Xtr_t[idx]).mean()
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
    train_s = time.time() - t0

    with torch.no_grad():
        lp = []
        for i in range(0, len(Xte), 5000):
            lp.append(dist.log_prob(torch.tensor(Xte[i:i + 5000])).numpy())
    test_nll = float(-np.concatenate(lp).mean())
    return test_nll, float(loss), train_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", choices=["ours", "ref"], required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    Xtr, Xte = make_gmm_data(DIM)
    fn = run_ours if args.impl == "ours" else run_ref
    test_nll, final_train, train_s = fn(Xtr, Xte, args.seed)
    rec = {"impl": args.impl, "family": "mademog", "dim": DIM,
           "seed": args.seed,
           "test_nll": round(test_nll, 4),
           "final_train_loss": round(final_train, 4),
           "train_seconds": round(train_s, 1),
           "config": f"h{HIDDEN}xB{BLOCKS}xK{COMPONENTS}mog "
                     f"batch{BATCH} steps{STEPS} lr{LR}"}
    out = os.path.join(os.path.dirname(__file__),
                       "parity_mademog_results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
