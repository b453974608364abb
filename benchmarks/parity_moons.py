"""Head-to-head NLL parity: nflows_tpu (TPU) vs bayesiains/nflows (torch CPU).

Trains the examples/moons.ipynb architecture (5 x [ReversePermutation,
MaskedAffineAutoregressiveTransform]) in BOTH libraries on the identical
standardized two-moons dataset, same optimizer (Adam 1e-3), same batch
schedule, and reports held-out test NLL and training throughput.

Parity target (BASELINE.md): test NLL agreement within Monte-Carlo error
(the two libraries use different init/minibatch RNGs, so convergence noise
~±0.03 nats is expected — not bit-identical loss curves).

Usage:  python benchmarks/parity_moons.py [--steps N] [--hidden H]
        python benchmarks/parity_moons.py --conditional   # conditional_moons.ipynb config
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
    Xtr, Ytr = make_moons(16384, noise=0.1, rng=rng)
    Xte, Yte = make_moons(4096, noise=0.1, rng=rng)
    mu, sd = Xtr.mean(0), Xtr.std(0)
    return (((Xtr - mu) / sd).astype(np.float32),
            ((Xte - mu) / sd).astype(np.float32),
            Ytr.astype(np.float32).reshape(-1, 1),
            Yte.astype(np.float32).reshape(-1, 1))


def _build_ours(hidden, conditional, key):
    import jax
    from nflows_tpu.flows import MaskedAutoregressiveFlow

    if not conditional:
        return MaskedAutoregressiveFlow(
            features=2, hidden_features=hidden, num_layers=5,
            num_blocks_per_layer=1, key=key, use_random_permutations=False)
    # conditional_moons.ipynb architecture: context'd MAF over a
    # ConditionalDiagonalNormal base with a Linear(1, 4) encoder
    from nflows_tpu.distributions import ConditionalDiagonalNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.nn.primitives import Dense
    from nflows_tpu.transforms import (
        CompositeTransform,
        MaskedAffineAutoregressiveTransform,
        ReversePermutation,
    )

    keys = jax.random.split(key, 6)
    layers = []
    for i in range(5):
        layers.append(ReversePermutation(2))
        layers.append(MaskedAffineAutoregressiveTransform(
            features=2, hidden_features=hidden, context_features=1,
            num_blocks=1, key=keys[i]))
    base = ConditionalDiagonalNormal(
        shape=[2], context_encoder=Dense(1, 4, key=keys[5]))
    return Flow(CompositeTransform(layers), base)


def run_ours(Xtr, Xte, Ytr, Yte, steps, hidden, batch, conditional=False):
    import jax
    import jax.numpy as jnp
    import optax

    from nflows_tpu.training import create_train_state, make_train_step

    flow = _build_ours(hidden, conditional, jax.random.key(0))
    opt = optax.adam(1e-3)
    state = create_train_state(flow, opt)
    step = make_train_step(opt)
    rng = np.random.default_rng(1)
    idx_all = rng.integers(0, len(Xtr), size=(steps, batch))

    def do_step(st, i):
        # host-side minibatch indexing: one dispatch per step, matching the
        # reference's torch indexing. steps/s here is per-step-dispatch
        # wall rate at a tiny model (bench.py is the throughput benchmark).
        if conditional:
            return step(st, jnp.asarray(Xtr[idx_all[i]]),
                        jnp.asarray(Ytr[idx_all[i]]))
        return step(st, jnp.asarray(Xtr[idx_all[i]]))

    # compile + drain on a throwaway state built from an independently
    # initialized flow, so both libraries run exactly `steps` updates from
    # the same initialization. (It must NOT share arrays with `state`:
    # the step donates its input, and donating buffers that `state` also
    # references would invalidate them.)
    warm_state = create_train_state(_build_ours(hidden, conditional,
                                                jax.random.key(1234)), opt)
    warm_state, m = do_step(warm_state, 0)
    float(m["loss"])
    del warm_state
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = do_step(state, i)
    float(m["loss"])  # value fetch: sound execution fence (benchmarks/_timing.py)
    dt = time.perf_counter() - t0

    if conditional:
        test_nll = float(-state.flow.log_prob(
            jnp.asarray(Xte), context=jnp.asarray(Yte)).mean())
    else:
        test_nll = float(-state.flow.log_prob(jnp.asarray(Xte)).mean())
    return test_nll, steps / dt


def run_reference(Xtr, Xte, Ytr, Yte, steps, hidden, batch, conditional=False):
    import torch

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "UMNN" not in sys.modules:
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub

    torch.manual_seed(0)
    torch.set_num_threads(8)
    if not conditional:
        from nflows.flows import MaskedAutoregressiveFlow
        flow = MaskedAutoregressiveFlow(
            features=2, hidden_features=hidden, num_layers=5,
            num_blocks_per_layer=1, use_random_permutations=False,
        )
    else:
        from nflows.distributions import ConditionalDiagonalNormal
        from nflows.flows.base import Flow
        from nflows.transforms import (
            CompositeTransform,
            MaskedAffineAutoregressiveTransform,
            ReversePermutation,
        )
        layers = []
        for _ in range(5):
            layers.append(ReversePermutation(2))
            layers.append(MaskedAffineAutoregressiveTransform(
                features=2, hidden_features=hidden, context_features=1,
                num_blocks=1))
        base = ConditionalDiagonalNormal(
            shape=[2], context_encoder=torch.nn.Linear(1, 4))
        flow = Flow(CompositeTransform(layers), base)
    opt = torch.optim.Adam(flow.parameters(), lr=1e-3)
    data = torch.as_tensor(Xtr)
    ctx_all = torch.as_tensor(Ytr) if conditional else None
    rng = np.random.default_rng(1)
    idx_all = rng.integers(0, len(Xtr), size=(steps, batch))

    t0 = time.perf_counter()
    for i in range(steps):
        idx = torch.as_tensor(idx_all[i])
        x = data[idx]
        opt.zero_grad()
        if conditional:
            loss = -flow.log_prob(x, context=ctx_all[idx]).mean()
        else:
            loss = -flow.log_prob(x).mean()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0

    with torch.no_grad():
        flow.eval()
        if conditional:
            test_nll = float(-flow.log_prob(
                torch.as_tensor(Xte), context=torch.as_tensor(Yte)).mean())
        else:
            test_nll = float(-flow.log_prob(torch.as_tensor(Xte)).mean())
    return test_nll, steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--conditional", action="store_true")
    args = ap.parse_args()

    Xtr, Xte, Ytr, Yte = get_data()
    ours_nll, ours_sps = run_ours(Xtr, Xte, Ytr, Yte, args.steps, args.hidden,
                                  args.batch, conditional=args.conditional)
    ref_nll, ref_sps = run_reference(Xtr, Xte, Ytr, Yte, args.steps,
                                     args.hidden, args.batch,
                                     conditional=args.conditional)

    kind = "conditional-moons" if args.conditional else "moons"
    print(json.dumps({
        "config": f"{kind} MAF(5x{args.hidden}), {args.steps} steps, batch {args.batch}",
        "nflows_tpu": {"test_nll": round(ours_nll, 4),
                       "steps_per_s": round(ours_sps, 1)},
        "reference": {"test_nll": round(ref_nll, 4),
                      "steps_per_s": round(ref_sps, 1)},
        "nll_gap": round(ours_nll - ref_nll, 4),
        "speedup": round(ours_sps / ref_sps, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
