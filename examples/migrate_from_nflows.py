"""Migrate a trained bayesiains/nflows (PyTorch) model to nflows_tpu.

Workflow for an existing reference user:

1. train (or load) your flow with the reference library as usual;
2. build the same architecture in nflows_tpu (constructors mirror the
   reference's signatures);
3. ``nflows_tpu.interop.from_torch(ours, ref)`` copies every trained
   parameter/buffer across (shape-checked);
4. run log_prob/sampling/further training on TPU.

This script demonstrates the round trip end-to-end: trains a small MAF on
two-moons with the *reference* on CPU, imports it, verifies identical test
log_probs, then keeps training it with nflows_tpu on TPU.

Run: python examples/migrate_from_nflows.py
(expects the reference checkout importable; pass --reference-path if it is
not at /root/reference)
"""

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def import_reference(path):
    if path not in sys.path:
        sys.path.insert(0, path)
    if "UMNN" not in sys.modules:  # reference hard-imports this pip package
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub
    import nflows
    return nflows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference-path", default="/root/reference")
    parser.add_argument("--torch-steps", type=int, default=500)
    parser.add_argument("--tpu-steps", type=int, default=2000)
    args = parser.parse_args()

    import torch
    import_reference(args.reference_path)
    from nflows.flows import MaskedAutoregressiveFlow as RefMAF

    from nflows_tpu.utils.datasets import make_moons

    rng = np.random.default_rng(0)
    X, _ = make_moons(8192, noise=0.1, rng=rng)
    X = ((X - X.mean(0)) / X.std(0)).astype(np.float32)

    # -- 1. train with the reference (your existing torch workflow) --------
    torch.manual_seed(0)
    ref = RefMAF(features=2, hidden_features=32, num_layers=5,
                 num_blocks_per_layer=1, use_random_permutations=False)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    data = torch.as_tensor(X)
    for i in range(args.torch_steps):
        idx = torch.as_tensor(rng.integers(0, len(X), 128))
        opt.zero_grad()
        (-ref.log_prob(data[idx]).mean()).backward()
        opt.step()
    ref.eval()
    with torch.no_grad():
        ref_nll = float(-ref.log_prob(data).mean())
    print(f"reference (torch) NLL after {args.torch_steps} steps: {ref_nll:.4f}")

    # -- 2+3. same architecture in nflows_tpu, import the weights ----------
    import jax
    import jax.numpy as jnp
    import optax

    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.interop import from_torch
    from nflows_tpu.training import create_train_state, make_train_step

    ours = MaskedAutoregressiveFlow(features=2, hidden_features=32,
                                    num_layers=5, num_blocks_per_layer=1,
                                    use_random_permutations=False,
                                    key=jax.random.key(0))
    ours = from_torch(ours, ref)

    with jax.default_matmul_precision("highest"):
        our_nll = float(-jax.jit(lambda f, x: f.log_prob(x))(
            ours, jnp.asarray(X)).mean())
    print(f"imported (TPU)   NLL: {our_nll:.4f}  "
          f"(|diff| = {abs(our_nll - ref_nll):.2e})")
    assert abs(our_nll - ref_nll) < 1e-3, "import mismatch"

    # -- 4. continue training on TPU ---------------------------------------
    optimizer = optax.adam(1e-3)
    state = create_train_state(ours, optimizer)
    step = make_train_step(optimizer)
    for i in range(args.tpu_steps):
        idx = rng.integers(0, len(X), 128)
        state, m = step(state, jnp.asarray(X[idx]))
    final = float(-state.flow.log_prob(jnp.asarray(X)).mean())
    print(f"after {args.tpu_steps} more TPU steps: NLL {final:.4f}")
    assert final < our_nll, "continued training should improve NLL"
    print("migration OK")


if __name__ == "__main__":
    main()
