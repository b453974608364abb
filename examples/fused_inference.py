"""Deploy-time inference with the whole-flow Pallas megakernels.

Train an NSF normally (autodiff'd XLA chain), then serve it at megakernel
speed: `flow.fused()` for direct use, or `serving.CompiledFlow` which
auto-selects the kernel (NSF rq/lrs, MAF, NSF-AR, IAF) when the model
qualifies. Measured on TPU v5-lite: NSF 1.5x the XLA chain both
directions, NSF-AR sampling 4.9x (BASELINE.md).

Run: python examples/fused_inference.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.serving import CompiledFlow
from nflows_tpu.training import create_train_state
from nflows_tpu.training.train import make_scan_train_step
from nflows_tpu.utils.datasets import make_moons


def main():
    # -- train (XLA chain, scan-fused loop) -------------------------------
    rng = np.random.default_rng(0)
    X, _ = make_moons(2 ** 14, noise=0.1, rng=rng)
    X = ((X - X.mean(0)) / X.std(0)).astype(np.float32)

    flow = NeuralSplineFlow(features=2, hidden_features=64, num_layers=4,
                            num_blocks_per_layer=2, num_bins=8,
                            tail_bound=3.0, key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    opt = optax.adam(1e-3)
    state = create_train_state(flow, opt)
    steps = make_scan_train_step(opt)
    batches = jnp.asarray(X[rng.integers(0, len(X), (2000, 256))])
    state, losses = steps(state, batches)
    print(f"trained: final NLL {float(losses[-1]):.4f}")

    # -- serve (megakernel) -----------------------------------------------
    trained = state.flow
    n = 1 << 18
    served = CompiledFlow(trained, batch_size=n, features=2, num_samples=n)
    print("fused kernel selected:" , served._fused is not None)

    key = jax.random.key(1)
    t0 = time.time()
    samples = served.sample(key)
    lp = served.log_prob(samples)
    print(f"{n:,} samples + log_probs in {time.time()-t0:.2f}s "
          f"(mean lp {float(lp.mean()):.4f})")

    # direct access to the fused view (e.g. for transform round-trips)
    fused = trained.fused()
    z, lad = fused.forward(samples[:1024])
    x_back, _ = fused.inverse(z)
    err = float(jnp.max(jnp.abs(samples[:1024] - x_back)))
    print(f"fused round-trip max err: {err:.2e}")


if __name__ == "__main__":
    main()
