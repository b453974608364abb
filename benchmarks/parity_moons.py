"""Head-to-head NLL parity: nflows_tpu (TPU) vs bayesiains/nflows (torch CPU).

Trains the examples/moons.ipynb architecture (5 x [ReversePermutation,
MaskedAffineAutoregressiveTransform]) in BOTH libraries on the identical
standardized two-moons dataset, same optimizer (Adam 1e-3), same batch
schedule, and reports held-out test NLL and training throughput.

Parity target (BASELINE.md): test NLL agreement within Monte-Carlo error
(the two libraries use different init/minibatch RNGs, so convergence noise
~±0.03 nats is expected — not bit-identical loss curves).

Usage:  python benchmarks/parity_moons.py [--steps 2000] [--hidden 32]
"""

import argparse
import json
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")  # repo root

from nflows_tpu.utils.datasets import make_moons

REFERENCE_PATH = "/root/reference"


def get_data(hidden_seed=0):
    rng = np.random.default_rng(0)
    Xtr, _ = make_moons(16384, noise=0.1, rng=rng)
    Xte, _ = make_moons(4096, noise=0.1, rng=rng)
    mu, sd = Xtr.mean(0), Xtr.std(0)
    return ((Xtr - mu) / sd).astype(np.float32), ((Xte - mu) / sd).astype(np.float32)


def run_ours(Xtr, Xte, steps, hidden, batch):
    import jax
    import jax.numpy as jnp
    import optax

    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.training import create_train_state, make_train_step

    flow = MaskedAutoregressiveFlow(
        features=2, hidden_features=hidden, num_layers=5,
        num_blocks_per_layer=1, key=jax.random.key(0),
        use_random_permutations=False,
    )
    opt = optax.adam(1e-3)
    state = create_train_state(flow, opt)
    step = make_train_step(opt)
    data = jnp.asarray(Xtr)
    rng = np.random.default_rng(1)
    idx_all = rng.integers(0, len(Xtr), size=(steps, batch))

    # compile + drain on a throwaway state so both libraries run exactly
    # `steps` updates from the same initialization
    warm_state, m = step(create_train_state(flow, opt), data[jnp.asarray(idx_all[0])])
    float(m["loss"])
    del warm_state
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, data[jnp.asarray(idx_all[i])])
    float(m["loss"])  # value fetch: sound execution fence (benchmarks/_timing.py)
    dt = time.perf_counter() - t0

    test_nll = float(-state.flow.log_prob(jnp.asarray(Xte)).mean())
    return test_nll, steps / dt


def run_reference(Xtr, Xte, steps, hidden, batch):
    import torch

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "UMNN" not in sys.modules:
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub

    from nflows.flows import MaskedAutoregressiveFlow

    torch.manual_seed(0)
    torch.set_num_threads(8)
    flow = MaskedAutoregressiveFlow(
        features=2, hidden_features=hidden, num_layers=5,
        num_blocks_per_layer=1, use_random_permutations=False,
    )
    opt = torch.optim.Adam(flow.parameters(), lr=1e-3)
    data = torch.as_tensor(Xtr)
    rng = np.random.default_rng(1)
    idx_all = rng.integers(0, len(Xtr), size=(steps, batch))

    t0 = time.perf_counter()
    for i in range(steps):
        x = data[torch.as_tensor(idx_all[i])]
        opt.zero_grad()
        loss = -flow.log_prob(x).mean()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0

    with torch.no_grad():
        flow.eval()
        test_nll = float(-flow.log_prob(torch.as_tensor(Xte)).mean())
    return test_nll, steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    Xtr, Xte = get_data()
    ours_nll, ours_sps = run_ours(Xtr, Xte, args.steps, args.hidden, args.batch)
    ref_nll, ref_sps = run_reference(Xtr, Xte, args.steps, args.hidden, args.batch)

    print(json.dumps({
        "config": f"moons MAF(5x{args.hidden}), {args.steps} steps, batch {args.batch}",
        "nflows_tpu": {"test_nll": round(ours_nll, 4),
                       "steps_per_s": round(ours_sps, 1)},
        "reference": {"test_nll": round(ref_nll, 4),
                      "steps_per_s": round(ref_sps, 1)},
        "nll_gap": round(ours_nll - ref_nll, 4),
        "speedup": round(ours_sps / ref_sps, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
