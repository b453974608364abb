"""End-to-end FUSED training: forward and backward passes each run as one
Pallas megakernel, then the trained weights export back to a standard flow
for serving.

The trainers share the recipe (custom_vjp fused forward +
recompute-in-kernel backward, trainable weights that are pure
transposes/permutations of the model's own so Adam follows the XLA
trajectory exactly):

- ``FusedNSFTrainer`` — coupling flows, all seven kinds
  (rq/lrs/linear/quadratic/cubic splines, affine/additive);
- ``FusedMAFTrainer`` — autoregressive flows (MAF, NSF-AR);
- ``FusedMADEMoGTrainer`` — the MADEMoG mixture-density family;
- (``FusedIAFTrainer`` trains IAFs variationally — see vi_smc.py.)

All take conditional models: pass the per-sample context as a fourth
operand and the backward also yields context gradients.
``training.fused_trainer(flow, batch)`` auto-selects;
``trainer.init_loop_state``/``make_loop_step`` compose with
``training.loop.run_training`` for checkpoint/resume.

Run: python examples/fused_training.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer
from nflows_tpu.utils.datasets import make_moons


def main():
    rng = np.random.default_rng(0)
    X, y = make_moons(2 ** 14, noise=0.1, rng=rng)
    X = ((X - X.mean(0)) / X.std(0)).astype(np.float32)
    # one-hot moon label as the conditioning context
    C = np.stack([y == 0, y == 1], axis=1).astype(np.float32)

    flow = NeuralSplineFlow(features=2, hidden_features=64, num_layers=4,
                            num_blocks_per_layer=2, num_bins=8,
                            tail_bound=3.0, context_features=2,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))

    # -- fused conditional training --------------------------------------
    trainer = FusedNSFTrainer(flow, batch_size=256)
    opt = optax.adam(1e-3)
    steps = trainer.make_scan_train_step(opt)
    weights, opt_state = trainer.weights, trainer.init_opt(opt)

    # interpret mode (no TPU) runs the kernels on CPU — keep it short there
    n_steps = 2000 if not trainer._interpret else 30
    idx = rng.integers(0, len(X), (n_steps, 256))
    batches = jnp.asarray(X[idx])
    contexts = jnp.asarray(C[idx])
    weights, opt_state, losses = steps(weights, opt_state, batches,
                                       contexts)
    print(f"fused-trained: NLL {float(losses[0]):.3f} -> "
          f"{float(losses[-1]):.3f}")

    # -- export to a standard flow and sample per context -----------------
    trained = trainer.to_flow(weights)
    ctx = jnp.eye(2, dtype=jnp.float32)          # one context per moon
    samples = trained.sample(jax.random.key(1), 1024, context=ctx)
    print("per-moon sample means:",
          np.asarray(samples.mean(axis=1)).round(3).tolist())

    # the exported flow evaluates identically to the fused loss
    xb, cb = jnp.asarray(X[:256]), jnp.asarray(C[:256])
    nll_flow = float(-trained.log_prob(xb, cb).mean())
    nll_fused = float(trainer.loss_fn(weights, xb.T, cb.T))
    print(f"export check: flow NLL {nll_flow:.5f} == fused {nll_fused:.5f}")


def zero_demo():
    """Fused training with ZeRO-sharded optimizer state (round 5): the
    megakernels run per batch shard, the fp32 Adam moments live sharded
    over the data axis (reduce-scattered grads, shard-local update,
    all-gathered weights). Needs >= 2 devices — run under
    XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU to try."""
    n = len(jax.devices())
    if n < 2:
        print(f"zero_demo: skipped ({n} device; see docstring)")
        return
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    rng = np.random.default_rng(0)
    X, _ = make_moons(4096, noise=0.1, rng=rng)
    X = ((X - X.mean(0)) / X.std(0)).astype(np.float32)
    Xp = np.concatenate([X, rng.normal(size=(len(X), 4)).astype(np.float32)],
                        axis=1)  # 6-D so the flagship config applies

    flow = NeuralSplineFlow(
        features=6, hidden_features=64, num_layers=4,
        num_blocks_per_layer=2, num_bins=8, key=jax.random.key(0),
        rng=np.random.default_rng(0), stacked=True)
    trainer = FusedNSFTrainer(flow, batch_size=128 * n)
    opt = optax.adam(1e-3)
    step = trainer.make_zero_train_step(opt, mesh, min_shard_elements=1024)
    weights = trainer.weights
    opt_state = trainer.init_opt_sharded(opt, mesh,
                                         min_shard_elements=1024)
    for i in range(10):
        idx = rng.integers(0, len(Xp), 128 * n)
        weights, opt_state, loss = step(weights, opt_state,
                                        jnp.asarray(Xp[idx]))
    sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(opt_state)
        if hasattr(leaf, "sharding")
        and any(s is not None for s in getattr(leaf.sharding, "spec", ())))
    print(f"zero_demo: {n}-way, loss {float(loss):.3f}, "
          f"{sharded} sharded moment leaves")


if __name__ == "__main__":
    main()
    zero_demo()
