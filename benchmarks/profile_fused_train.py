"""Component decomposition of fused-trainer cost vs the XLA chain.

Round-5 VERDICT item 3: the fused AR/MADEMoG *training* kernels measure
0.82-0.98x XLA at every production batch (BASELINE.md round-4 table) and
no profile explains where the loss goes. This bench splits one step into
its stages for BOTH paths:

- forward only (loss value, no grad)          -> kernel/pass cost
- value_and_grad (fwd + bwd)                  -> + backward cost
- full train step (vag + Adam + weight fold)  -> + optimizer/fold cost

and reports the deltas, so the overhead names itself: if fused loses in
`fwd`, the grid/launch path is the problem; if the gap opens at `vag`,
it's the in-kernel recompute; if at `step`, the per-step fold.

Usage: python benchmarks/profile_fused_train.py --family maf --batch 2048
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks._timing import timeit_calls


def _timeit(fn, args_list, drain, reps):
    # thin adapter over the shared protocol (benchmarks/_timing.py):
    # last entry is the untimed warmup, the first `reps` are timed
    return timeit_calls(fn, args_list[:reps] + [args_list[-1]], drain)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=["nsf", "maf", "mademog"],
                   default="maf")
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--features", type=int, default=6)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=10)
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--bins", type=int, default=8)
    p.add_argument("--inner", type=int, default=100,
                   help="scan window for the full-step row")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from nflows_tpu.distributions import MADEMoG
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.ops.pallas.mademog_train import FusedMADEMoGTrainer
    from nflows_tpu.ops.pallas.maf_train import FusedMAFTrainer
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    rng = np.random.default_rng(0)

    def flow_for():
        if args.family == "maf":
            return MaskedAutoregressiveFlow(
                features=args.features, hidden_features=args.hidden,
                num_layers=args.layers, num_blocks_per_layer=args.blocks,
                use_random_permutations=True, key=jax.random.key(0),
                rng=np.random.default_rng(0))
        if args.family == "mademog":
            return MADEMoG(
                features=args.features, hidden_features=args.hidden,
                context_features=None, num_blocks=args.blocks,
                num_mixture_components=args.bins, key=jax.random.key(0),
                rng=np.random.default_rng(0))
        return NeuralSplineFlow(
            features=args.features, hidden_features=args.hidden,
            num_layers=args.layers, num_blocks_per_layer=args.blocks,
            num_bins=args.bins, key=jax.random.key(0),
            rng=np.random.default_rng(0), stacked=True)

    trainer_cls = {"nsf": FusedNSFTrainer, "maf": FusedMAFTrainer,
                   "mademog": FusedMADEMoGTrainer}[args.family]

    N, D = args.batch, args.features

    flow = flow_for()
    trainer = trainer_cls(flow_for(), batch_size=N)
    w = trainer.weights

    # every stage scans over an [inner, N, D] window so the ~20 ms tunnel
    # dispatch amortizes away (single-call timings are dispatch-noise on
    # this setup — BASELINE.md "remote tunnel, not device compute")
    windows = [
        jnp.asarray(rng.normal(size=(args.inner, N, D)), jnp.float32)
        for _ in range(args.reps + 1)
    ]

    def report(name, t_x, t_f):
        print(f"{name:28s}: XLA {1e6 * t_x:9.1f} us | fused "
              f"{1e6 * t_f:9.1f} us | fused/XLA speed "
              f"{t_x / t_f:5.2f}x", flush=True)
        return t_x, t_f

    def timed_scan(fn, drain=lambda o: float(o[-1])):
        jf = jax.jit(fn)
        return _timeit(jf, [(wd,) for wd in windows], drain,
                       args.reps) / args.inner

    from nflows_tpu.training.train import combine, partition

    params0, rest0 = partition(flow)

    def xla_loss(p, b):
        return -combine(p, rest0).log_prob(b).mean()

    # ---- forward (loss value only) ----
    def xla_fwd_scan(wd):
        def one(c, b):
            return c, xla_loss(params0, b)
        return jax.lax.scan(one, 0.0, wd)[1]

    def fused_fwd_scan(wd):
        def one(c, b):
            return c, trainer.loss_fn(w, b.T)
        return jax.lax.scan(one, 0.0, wd)[1]

    t_x_f = timed_scan(xla_fwd_scan)
    t_f_f = timed_scan(fused_fwd_scan)
    report("forward (loss)", t_x_f, t_f_f)

    # ---- value_and_grad (grads consumed via a total so nothing DCEs) ----
    def gsum(tree):
        return sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(tree))

    def xla_vag_scan(wd):
        def one(c, b):
            loss, grads = jax.value_and_grad(xla_loss)(params0, b)
            return c, loss + 1e-30 * gsum(grads)
        return jax.lax.scan(one, 0.0, wd)[1]

    fused_vag_fn = trainer._value_and_grad()

    def fused_vag_scan(wd):
        def one(c, b):
            loss, grads = fused_vag_fn(w, b.T)
            return c, loss + 1e-30 * gsum(grads)
        return jax.lax.scan(one, 0.0, wd)[1]

    t_x_g = timed_scan(xla_vag_scan)
    t_f_g = timed_scan(fused_vag_scan)
    report("value_and_grad", t_x_g, t_f_g)

    # ---- full scan-fused train step (the production row) ----
    opt = optax.adam(3e-4)
    state = create_train_state(flow, opt)
    steps = make_scan_train_step(opt, donate=False)
    t_x_s = _timeit(lambda wd: steps(state, wd),
                    [(wd,) for wd in windows],
                    lambda o: float(o[1][-1]), args.reps) / args.inner

    fused_steps = trainer.make_scan_train_step(opt, donate=False)
    opt_state = trainer.init_opt(opt)
    t_f_s = _timeit(lambda wd: fused_steps(w, opt_state, wd),
                    [(wd,) for wd in windows],
                    lambda o: float(o[2][-1]), args.reps) / args.inner
    report("train step (scan window)", t_x_s, t_f_s)

    print("\ndeltas (per step):")
    print(f"  backward  = vag - fwd : XLA {1e6 * (t_x_g - t_x_f):9.1f} us"
          f" | fused {1e6 * (t_f_g - t_f_f):9.1f} us")
    print(f"  opt+fold  = step - vag: XLA {1e6 * (t_x_s - t_x_g):9.1f} us"
          f" | fused {1e6 * (t_f_s - t_f_g):9.1f} us")


if __name__ == "__main__":
    main()
