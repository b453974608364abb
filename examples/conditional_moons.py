"""Conditional two-moons: class-conditional flow with a conditional base —
the nflows_tpu analogue of the reference's examples/conditional_moons.ipynb
(ConditionalDiagonalNormal base with a linear context encoder + conditional
MAF layers).

Run: python examples/conditional_moons.py [--steps 3000]
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
from nflows_tpu.distributions import ConditionalDiagonalNormal
from nflows_tpu.flows import Flow
from nflows_tpu.nn.primitives import Dense
from nflows_tpu.training import create_train_state, make_train_step
from nflows_tpu.transforms import (
    CompositeTransform,
    MaskedAffineAutoregressiveTransform,
    ReversePermutation,
)
from nflows_tpu.utils.datasets import make_moons


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    X, y = make_moons(2 ** 14, noise=0.1, rng=rng)
    X = (X - X.mean(0)) / X.std(0)
    context = y[:, None].astype(np.float32)
    loader = make_dataloader(X, args.batch_size, context=context, seed=args.seed)

    key = jax.random.key(args.seed)
    keys = jax.random.split(key, 6)
    base = ConditionalDiagonalNormal([2], context_encoder=Dense(1, 4, key=keys[0]))
    layers = []
    for i in range(5):
        layers.append(ReversePermutation(2))
        layers.append(MaskedAffineAutoregressiveTransform(
            features=2, hidden_features=32, context_features=1, key=keys[i + 1]))
    flow = Flow(CompositeTransform(layers), base)

    optimizer = optax.adam(1e-3)
    state = create_train_state(flow, optimizer)
    step = make_train_step(optimizer)

    t0 = time.time()
    for i in range(args.steps):
        batch, ctx = next(loader)
        state, metrics = step(state, jnp.asarray(batch), jnp.asarray(ctx))
        if (i + 1) % 500 == 0:
            print(f"step {i+1:5d}  nll {float(metrics['loss']):.4f}")
    print(f"trained in {time.time()-t0:.1f}s")

    # per-class samples: context [2, 1] -> [2, n, 2]
    ctx = jnp.asarray([[0.0], [1.0]])
    samples = state.flow.sample(jax.random.key(1), 2048, context=ctx)
    for c in range(2):
        m = np.asarray(samples[c].mean(0))
        print(f"class {c}: sample mean {m}")


if __name__ == "__main__":
    main()
