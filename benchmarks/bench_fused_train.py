"""Fused-training benchmark: FusedNSFTrainer (forward+backward Pallas
megakernels) vs the XLA scan-fused train loop at the flagship config.

Round-2 VERDICT item 2's "done" bar: fused train_step >= 1.2x the XLA
train step at the flagship config, or a measurement-backed impossibility
note in DESIGN.md. Both paths run identical math (Adam, fp32 params,
-mean log_prob loss); timing per benchmarks/_timing.py (dispatch ->
scalar fetch on fresh inputs, scan windows amortize the round trip).

Usage: python benchmarks/bench_fused_train.py [--batch 512 2048 8192]
       python benchmarks/bench_fused_train.py --family maf   # AR trainer
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--features", type=int, default=6)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=10)
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--bins", type=int, default=8)
    p.add_argument("--batch", type=int, nargs="+", default=[512, 2048, 8192])
    p.add_argument("--inner", type=int, default=100,
                   help="train steps per dispatch (lax.scan window)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--matmul-precision", default=None,
                   choices=["bfloat16", "tensorfloat32", "float32"],
                   help="jax_default_matmul_precision for BOTH paths "
                        "(bench.py's headline uses bfloat16)")
    p.add_argument("--family", choices=["nsf", "maf", "mademog"],
                   default="nsf",
                   help="nsf = stacked coupling flow (FusedNSFTrainer); "
                        "maf = masked-affine AR flow (FusedMAFTrainer); "
                        "mademog = mixture-density MADE "
                        "(FusedMADEMoGTrainer)")
    p.add_argument("--packed", nargs="?", const="mm", default=None,
                   choices=["mm", "roll", "fat", "off"],
                   help="packed-sublane spline stage in the fused trainer "
                        "(config.packed_spline_select): 'mm' = kron matmul "
                        "form, 'roll' = pltpu roll/repeat structural moves")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    if args.matmul_precision:
        # bench.py's production config: DEFAULT-precision f32 dots lower as
        # bf16 MXU passes — applies to the XLA chain AND the Pallas
        # kernels' dot_generals (precision resolves from this config at
        # trace time), keeping the comparison apples-to-apples
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    if args.packed:
        from nflows_tpu import config
        config.packed_spline_select(
            False if args.packed == "off" else args.packed)

    from benchmarks._timing import timeit_calls
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

    # model-FLOP accounting for the MFU column (NSF coupling only; the
    # convention matches benchmarks/mxu_width.py: train step = 3x forward
    # model FLOPs, 197 TFLOPS bf16 peak on v5e)
    BF16_PEAK_TFLOPS = 197.0
    if args.family == "nsf":
        Tid, T = args.features // 2, args.features - args.features // 2
        out = T * (3 * args.bins - 1)
        fwd_macs = args.layers * (
            Tid * args.hidden + 2 * args.blocks * args.hidden * args.hidden
            + args.hidden * out)
    else:
        fwd_macs = None

    def mfu(batch, t_step):
        if fwd_macs is None:
            return ""
        tf = 3 * 2 * batch * fwd_macs / t_step / 1e12
        return f" | {tf:5.1f} TFLOPS = {100*tf/BF16_PEAK_TFLOPS:4.1f}% MXU"

    for batch in args.batch:
        windows = [
            jnp.asarray(rng.normal(size=(args.inner, batch, args.features)),
                        dtype=jnp.float32)
            for _ in range(args.reps + 1)
        ]

        # ---- XLA scan-fused loop (bench.py's path, fp32 for parity) ----
        flow = flow_for()
        opt = optax.adam(3e-4)
        state = create_train_state(flow, opt)
        # donate=False: timeit_calls reuses `state` across warmup + reps;
        # donation would invalidate its buffers after the first call
        steps = make_scan_train_step(opt, donate=False)

        def run_xla(w):
            return steps(state, w)

        def drain_xla(out):
            s2, losses = out
            return float(losses[-1])

        t_xla = timeit_calls(run_xla, [(w,) for w in windows], drain_xla)
        sps_xla = args.inner / t_xla

        # ---- fused megakernel trainer ----
        trainer = trainer_cls(flow_for(), batch_size=batch)
        # donate=False for the same reason as the XLA path: the timed reps
        # restart from the same initial state, so its buffers must survive
        fused_steps = trainer.make_scan_train_step(opt, donate=False)
        weights = trainer.weights
        opt_state = trainer.init_opt(opt)

        def run_fused(w):
            return fused_steps(weights, opt_state, w)

        def drain_fused(out):
            _, _, losses = out
            return float(losses[-1])

        try:
            t_fused = timeit_calls(run_fused, [(w,) for w in windows],
                                   drain_fused)
        except Exception as e:  # e.g. VMEM OOM at wide hidden — keep
            # sweeping and report the XLA row (hidden 512 measured
            # 130.5M/128M VMEM, round 5)
            msg = str(e).splitlines()[-1][:120]
            print(f"batch {batch:6d}: XLA {sps_xla:8.1f} steps/s "
                  f"({1e6*t_xla/args.inner:7.1f} us) | fused FAILED: "
                  f"{msg}", flush=True)
            continue
        sps_fused = args.inner / t_fused

        print(f"batch {batch:6d}: XLA {sps_xla:8.1f} steps/s "
              f"({1e6*t_xla/args.inner:7.1f} us) | fused {sps_fused:8.1f} "
              f"steps/s ({1e6*t_fused/args.inner:7.1f} us) | "
              f"fused/XLA = {sps_fused/sps_xla:.2f}x"
              f"{mfu(batch, t_fused/args.inner)}", flush=True)


if __name__ == "__main__":
    main()
