"""Does the large-batch fused-training throughput win buy convergence?

Round-5 VERDICT item 6: the fused NSF trainer wins 1.36-1.76x steps/s at
batch >= 2048 (BASELINE.md round-4 table) — but that only matters if
large-batch training reaches equal test NLL in less wall-clock. This
race re-runs the d=8 GMM protocol (benchmarks/parity_middim.py — same
data, model, total sample budget) two ways:

- XLA chain, batch 512, lr 5e-4, 5000 steps  (the parity protocol)
- fused trainer, batch 2048, lr 5e-4*sqrt(4)=1e-3, 1250 steps
  (equal sample budget; Adam sqrt-scaling for the 4x batch)

and reports the test-NLL trajectory against CUMULATIVE TRAIN TIME (eval
excluded from the clock), plus time-to-target where target = the
parity runs' d=8 NLL band (~6.19; BASELINE.md mid-dim table).

Usage: python benchmarks/convergence_largebatch.py [--target 6.21]
Appends one JSON line per arm to benchmarks/convergence_results.jsonl.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from parity_middim import (  # noqa: E402  (same protocol constants)
    HIDDEN, LAYERS, BLOCKS, BINS, TAIL, LR, make_gmm_data, minibatch_stream,
)

STEPS_SMALL, BATCH_SMALL = 5000, 512
STEPS_LARGE, BATCH_LARGE = 1250, 2048
EVAL_EVERY_SMALL, EVAL_EVERY_LARGE = 500, 125


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--target", type=float, default=None,
                   help="target test NLL (default: worst ours d=8 parity "
                        "seed, 6.224)")
    args = p.parse_args()
    target = args.target if args.target is not None else 6.224

    import jax
    import jax.numpy as jnp
    import optax

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    Xtr, Xte = make_gmm_data(args.dim, seed=0)
    Xte_j = jnp.asarray(Xte)

    def flow_for():
        return NeuralSplineFlow(
            features=args.dim, hidden_features=HIDDEN, num_layers=LAYERS,
            num_blocks_per_layer=BLOCKS, num_bins=BINS, tail_bound=TAIL,
            key=jax.random.key(args.seed),
            rng=np.random.default_rng(args.seed),
            use_random_permutations=True, stacked=True)

    eval_lp = jax.jit(lambda fl, x: fl.log_prob(x))

    def test_nll(fl):
        lp = [np.asarray(eval_lp(fl, Xte_j[i:i + 5000]))
              for i in range(0, len(Xte), 5000)]
        return float(-np.concatenate(lp).mean())

    results = []

    def record(arm, batch, lr, steps, traj):
        t_hit = next((t for t, nll in traj if nll <= target), None)
        row = {
            "arm": arm, "dim": args.dim, "seed": args.seed,
            "batch": batch, "lr": lr, "steps": steps,
            "target_nll": target, "time_to_target_s": t_hit,
            "final_nll": traj[-1][1], "train_seconds": traj[-1][0],
            "trajectory": [[round(t, 2), round(nll, 4)] for t, nll in traj],
        }
        results.append(row)
        print(json.dumps({k: v for k, v in row.items()
                          if k != "trajectory"}), flush=True)

    # ---- arm 1: XLA chain, batch 512 (the parity protocol) ----
    opt = optax.adam(LR)
    state = create_train_state(flow_for(), opt)
    steps_fn = make_scan_train_step(opt)
    stream = minibatch_stream(len(Xtr), args.seed)
    traj, t_cum = [], 0.0
    # warmup/compile outside the clock (both arms measure steady-state
    # train time, matching how BASELINE reports steps/s)
    w0 = jnp.asarray(Xtr[np.stack([next(stream)
                                   for _ in range(EVAL_EVERY_SMALL)])])
    state, _ = steps_fn(state, w0)
    state = create_train_state(flow_for(), opt)
    for start in range(0, STEPS_SMALL, EVAL_EVERY_SMALL):
        idx = np.stack([next(stream) for _ in range(EVAL_EVERY_SMALL)])
        batches = jnp.asarray(Xtr[idx])
        t0 = time.time()
        state, losses = steps_fn(state, batches)
        float(losses[-1])
        t_cum += time.time() - t0
        traj.append((t_cum, test_nll(state.flow)))
    record("xla", BATCH_SMALL, LR, STEPS_SMALL, traj)

    # ---- arm 2: fused trainer, batch 2048, sqrt-scaled lr ----
    lr_large = LR * (BATCH_LARGE / BATCH_SMALL) ** 0.5
    # minibatch_stream yields BATCH(=512)-sized index draws; draw 4 per
    # large step from the SAME stream construction for comparable mixing
    trainer = FusedNSFTrainer(flow_for(), batch_size=BATCH_LARGE)
    opt2 = optax.adam(lr_large)
    fused_steps = trainer.make_scan_train_step(opt2)
    stream = minibatch_stream(len(Xtr), args.seed)
    w, s = trainer.weights, trainer.init_opt(opt2)
    traj, t_cum = [], 0.0
    n_draws = BATCH_LARGE // BATCH_SMALL
    w0 = jnp.asarray(Xtr[np.stack(
        [np.concatenate([next(stream) for _ in range(n_draws)])
         for _ in range(EVAL_EVERY_LARGE)])])
    # compile on COPIES: the scan step donates its weight/opt buffers
    _ = fused_steps(jax.tree_util.tree_map(jnp.array, w),
                    jax.tree_util.tree_map(jnp.array, s), w0)
    for start in range(0, STEPS_LARGE, EVAL_EVERY_LARGE):
        idx = np.stack(
            [np.concatenate([next(stream) for _ in range(n_draws)])
             for _ in range(EVAL_EVERY_LARGE)])
        batches = jnp.asarray(Xtr[idx])
        t0 = time.time()
        w, s, losses = fused_steps(w, s, batches)
        float(losses[-1])
        t_cum += time.time() - t0
        traj.append((t_cum, test_nll(trainer.to_flow(w))))
    record("fused_large", BATCH_LARGE, lr_large, STEPS_LARGE, traj)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "convergence_results.jsonl")
    with open(out, "a") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
