"""Flow-based variational inference + SMC refinement on an unnormalized
target — the inference-side workflow (the reference only covers density
estimation; this exercises nflows_tpu.parallel.vi / .smc).

1. Fit an NSF flow to an unnormalized banana-shaped target by reverse-KL VI
   (sharded ELBO steps, gradients pmean'd over the mesh).
2. Refine with sharded AIS/SMC using the fitted flow as the proposal:
   tempered reweighting + MH moves, importance-weight normalization over
   ICI collectives; reports the evidence estimate log Z and the ESS.

Run: python examples/vi_smc.py [--steps 1500]
     (single chip; add devices and the same code shards chains across them)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import optax

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.parallel import (
    effective_sample_size,
    make_mesh,
    make_sharded_smc,
    make_sharded_vi_step,
    sharded_importance_weights,
)
from nflows_tpu.training import create_train_state


def target_log_prob(x):
    """Unnormalized 2-D banana: x1 ~ N(0, 2^2), x2 | x1 ~ N(x1^2/4, 0.5^2).
    True log Z = log(2 pi * 2 * 0.5)."""
    return (-0.5 * x[..., 0] ** 2 / 4.0
            - 0.5 * (x[..., 1] - x[..., 0] ** 2 / 4.0) ** 2 / 0.25)


TRUE_LOG_Z = float(np.log(2 * np.pi * 2.0 * 0.5))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--chains-per-device", type=int, default=2048)
    args = parser.parse_args()

    mesh = make_mesh(model=1)
    n_dev = mesh.shape["data"]
    print(f"mesh: {n_dev} device(s) on the 'data' (chain) axis")

    flow = NeuralSplineFlow(features=2, hidden_features=64, num_layers=4,
                            num_blocks_per_layer=1, num_bins=8,
                            tail_bound=4.0, key=jax.random.key(0))
    opt = optax.adam(2e-3)
    state = create_train_state(flow, opt)
    step = make_sharded_vi_step(opt, mesh, target_log_prob,
                                num_samples_per_device=256, donate=False)

    for i in range(args.steps):
        state, metrics = step(state, jax.random.key(i))
        if (i + 1) % 500 == 0:
            print(f"step {i+1:5d}  ELBO {float(metrics['elbo']):.4f}")
    fitted = state.flow

    # plain importance sampling with the fitted proposal
    is_fn = sharded_importance_weights(fitted, target_log_prob, mesh,
                                       num_samples_per_device=args.chains_per_device)
    samples, weights, log_z_is = is_fn(fitted, jax.random.key(10_000))
    ess_is = float(effective_sample_size(weights))  # weights already normalized
    print(f"IS : log Z = {float(log_z_is):+.4f}  (true {TRUE_LOG_Z:+.4f})  "
          f"ESS {ess_is:.0f}/{samples.shape[0]}")

    # SMC/AIS refinement
    run = make_sharded_smc(target_log_prob, mesh,
                           num_chains_per_device=args.chains_per_device,
                           num_temps=16, mcmc_steps=2, step_size=0.4)
    out = run(fitted, jax.random.key(20_000))
    print(f"SMC: log Z = {float(out['log_z']):+.4f}  (true {TRUE_LOG_Z:+.4f})  "
          f"ESS {float(out['ess']):.0f}  acceptance {float(out['acceptance']):.2f}")

    # ---- fused IAF VI: the same reverse-KL objective, but the flow's
    # native sampling direction runs as forward+backward megakernels
    # (ops/pallas/maf_train.FusedIAFTrainer) ----
    from nflows_tpu.models import InverseAutoregressiveFlow
    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer

    iaf = InverseAutoregressiveFlow(features=2, hidden_features=32,
                                    num_layers=3, num_blocks_per_layer=1,
                                    key=jax.random.key(1))
    tr = FusedIAFTrainer(iaf, batch_size=512)
    vi_steps = args.steps if not tr._interpret else 40  # CPU interpret demo
    vstep = tr.make_vi_train_step(optax.adam(2e-3), target_log_prob,
                                  donate=False)
    w, s = tr.weights, tr.init_opt(optax.adam(2e-3))
    losses = []
    for i in range(vi_steps):
        w, s, loss = vstep(w, s, jax.random.key(30_000 + i))
        losses.append(float(loss))
    if losses:
        print(f"fused IAF VI: -ELBO {losses[0]:.3f} -> {losses[-1]:.3f} "
              f"({vi_steps} megakernel steps)")


if __name__ == "__main__":
    main()
