"""Analytic HBM-traffic model for fused vs XLA-chain NSF training.

Why this exists: the fused-training megakernels (ops/pallas/nsf_train.py)
landed while the TPU tunnel was down, so their measured speedup is
pending. This model states the *expected* win from first principles so
the measurement has a prediction to land against — and so the mechanism
("activations never touch HBM") is checkable as arithmetic rather than
prose. Run it: ``python benchmarks/hbm_model.py [--batch 512]``.

Model (per optimizer step, coupling NSF, flagship config by default —
features=6, hidden=256, layers=10, blocks=2, bins=8, the config of
bench.py and the NSF paper's UCI-POWER entry, reference architecture at
/root/reference/nflows/transforms/coupling.py:502-582 +
/root/reference/nflows/nn/nets/resnet.py:9-80):

- XLA chain: weights are read in the forward and again in the backward;
  every GEMM's input activation is saved to HBM in the forward and read
  back in the backward (XLA fuses elementwise chains into the GEMMs, so
  we count only GEMM boundaries — this *understates* XLA traffic, i.e.
  is conservative in XLA's favor; spline parameter tensors [N, P] are
  counted once each way).
- Fused path: the forward kernel reads the weights once and writes only
  (y, logabsdet); the backward kernel reads (weights, x, dy), recomputes
  all activations in VMEM (in-kernel rematerialization), and writes dW.
- Optimizer (Adam) traffic — read (W, g, m, v), write (W, m, v) — is
  identical on both paths and included in both totals, since the
  user-visible speedup is on the whole step.

All tensors fp32 (the trainer's canonical weights are fp32; bf16 GEMM
precision changes FLOPs/cycle, not these byte counts).
"""

import argparse


def nsf_layer_shapes(features=6, hidden=256, blocks=2, bins=8):
    """GEMM shapes [in, out] of one coupling layer's conditioner."""
    d_id = features - features // 2   # identity half feeds the net
    d_tr = features // 2
    p = d_tr * (3 * bins + 1)         # RQ spline params per sample
    gemms = [(d_id, hidden)]
    gemms += [(hidden, hidden)] * (2 * blocks)
    gemms += [(hidden, p)]
    return gemms, d_id, p


def step_traffic(batch, features=6, hidden=256, layers=10, blocks=2,
                 bins=8):
    """Returns (xla_bytes, fused_bytes, weight_bytes) per train step."""
    gemms, d_id, p = nsf_layer_shapes(features, hidden, blocks, bins)
    f32 = 4
    w_layer = sum(i * o + o for i, o in gemms) * f32      # + biases
    w_total = layers * w_layer

    # activations saved at GEMM boundaries, per layer: each GEMM's input
    # [N, in] is a backward residual; the spline params [N, p] too.
    act_layer = (sum(i for i, _ in gemms) + p) * batch * f32
    act_total = layers * act_layer

    io = 2 * batch * features * f32                       # x in, y out
    adam = 7 * w_total                                    # r(W,g,m,v) w(W,m,v)

    xla = (w_total          # forward weight read
           + act_total      # forward residual writes
           + w_total        # backward weight read
           + act_total      # backward residual reads
           + w_total        # dW write
           + io) + adam
    fused = (w_total        # forward kernel weight read
             + w_total      # backward kernel weight read
             + w_total      # dW write
             + 2 * io       # backward also re-reads x and dy
             ) + adam
    return xla, fused, w_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", type=int, default=6)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--bins", type=int, default=8)
    args = ap.parse_args()

    mb = 1 / (1024 * 1024)
    print(f"config: d={args.features} h={args.hidden} L={args.layers} "
          f"blocks={args.blocks} K={args.bins}")
    print(f"{'batch':>6} {'XLA MB/step':>12} {'fused MB/step':>14} "
          f"{'traffic ratio':>14}")
    for batch in (512, 2048, 8192):
        xla, fused, w = step_traffic(
            batch, args.features, args.hidden, args.layers, args.blocks,
            args.bins)
        print(f"{batch:>6} {xla * mb:>12.1f} {fused * mb:>14.1f} "
              f"{xla / fused:>13.2f}x")
    print(f"(weights: {w * mb:.1f} MB; Adam traffic {7 * w * mb:.1f} MB "
          "is common to both paths and included above)")


if __name__ == "__main__":
    main()
