"""Train the flagship RQ-NSF coupling flow on tabular data (UCI-style).

Loads a .npy/.npz file of shape [N, D] if given, otherwise generates a
synthetic correlated dataset at UCI-POWER scale. Demonstrates the full
production path: C++ prefetch loader, jitted (optionally mesh-sharded)
train step, checkpointing, metrics, and final eval NLL.

Run:  python examples/train_nsf.py [--data path.npy] [--steps 10000]
      python examples/train_nsf.py --mesh   # data-parallel over all devices
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nflows_tpu.data import make_dataloader
from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.training import create_train_state, make_train_step
from nflows_tpu.training.checkpoint import CheckpointManager
from nflows_tpu.utils.observability import MetricLogger


def synthetic_power_like(n=100_000, d=6, seed=0):
    """Correlated non-gaussian synthetic data at UCI-POWER scale."""
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(n, d))
    A = rng.normal(size=(d, d)) / np.sqrt(d)
    x = np.tanh(z @ A) + 0.1 * z
    return x.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default=None)
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--layers", type=int, default=10)
    parser.add_argument("--bins", type=int, default=8)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--mesh", action="store_true",
                        help="data-parallel over all local devices")
    parser.add_argument("--ckpt-dir", type=str, default=None)
    args = parser.parse_args()

    if args.data:
        arr = np.load(args.data)
        X = arr[arr.files[0]] if hasattr(arr, "files") else arr
        X = np.asarray(X, dtype=np.float32)
    else:
        X = synthetic_power_like(seed=args.seed)
    n_test = max(1024, len(X) // 10)
    X_train, X_test = X[:-n_test], X[-n_test:]
    # normalize with TRAIN statistics only (no test leakage into the eval)
    mu, sd = X_train.mean(0), X_train.std(0)
    X_train = (X_train - mu) / sd
    X_test = (X_test - mu) / sd
    print(f"data: train {X_train.shape}, test {X_test.shape}")

    flow = NeuralSplineFlow(
        features=X.shape[1], hidden_features=args.hidden,
        num_layers=args.layers, num_blocks_per_layer=2, num_bins=args.bins,
        tail_bound=3.0, key=jax.random.key(args.seed),
        rng=np.random.default_rng(args.seed),
    )
    print(f"model: {flow.num_parameters():,} parameters")

    optimizer = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(optax.cosine_decay_schedule(args.lr, args.steps)),
    )
    state = create_train_state(flow, optimizer)

    if args.mesh:
        from nflows_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
        mesh = make_mesh()
        step_fn = make_sharded_train_step(optimizer, mesh)
        prep = lambda b: shard_batch(jnp.asarray(b), mesh)
        print(f"mesh: {dict(mesh.shape)}")
    else:
        step_fn = make_train_step(optimizer)
        prep = jnp.asarray

    loader = make_dataloader(X_train, args.batch_size, seed=args.seed)
    logger = MetricLogger()
    ckpt = CheckpointManager(args.ckpt_dir, max_to_keep=2) if args.ckpt_dir else None

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step_fn(state, prep(next(loader)))
        if (i + 1) % 1000 == 0:
            float(metrics["loss"])  # value fetch = sound fence (BASELINE.md)
            rate = (i + 1) / (time.time() - t0)
            logger.log(i + 1, loss=metrics["loss"], steps_per_s=rate)
            print(f"step {i+1:6d}  nll {float(metrics['loss']):.4f}  "
                  f"{rate:.1f} steps/s")
            if ckpt:
                ckpt.save(i + 1, state)

    test_nll = -float(state.flow.log_prob(jnp.asarray(X_test)).mean())
    print(f"final test NLL: {test_nll:.4f}")
    if ckpt:
        ckpt.close()


if __name__ == "__main__":
    main()
