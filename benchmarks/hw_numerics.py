"""Hardware numerics gate: fused-path error bands on the REAL TPU.

CI runs CPU-only (tests/conftest.py pins JAX_PLATFORMS=cpu), so a Pallas
path whose Mosaic compilation diverges from interpret mode is invisible
to the test suite. Round 4 found exactly such a bug: the packed-sublane
spline's structural matmuls ran at the MXU's DEFAULT bf16 truncation,
producing 0.25-class output errors and inverse NaNs on hardware while
every CPU test passed. This script is the gate that would have caught it:
it runs every fused path on the real chip and asserts fused-vs-XLA error
bands (the bf16-GEMM band established in BASELINE.md).

Run on any TPU-connected checkout:  python benchmarks/hw_numerics.py
Exits 0 iff every band holds; prints one PASS/FAIL line per path.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

FAILED = []


def check(name, err, bound):
    ok = np.isfinite(err) and err <= bound
    print(f"{'PASS' if ok else 'FAIL'}  {name}: err {err:.2e} "
          f"(bound {bound:.0e})", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    import jax
    import jax.numpy as jnp

    # production precision: the band below is bf16-GEMM-limited, and this
    # is the config serving/training actually run under (bench.py)
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu import config
    from nflows_tpu.distributions import MADEMoG
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.ops.pallas.mademog_fused import fuse_mademog
    from nflows_tpu.ops.pallas.maf_fused import fuse_maf
    from nflows_tpu.ops.pallas.nsf_fused import fuse_nsf
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    rng = np.random.default_rng(0)
    N = 4096

    # --- NSF coupling flow: unpacked + packed select, both directions ---
    flow = NeuralSplineFlow(
        features=6, hidden_features=64, num_layers=4,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    x = jnp.asarray(rng.normal(size=(N, 6)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(N, 6)), jnp.float32)
    z_ref, lad_f_ref = jax.jit(flow.transform.forward)(x)
    x_ref, lad_i_ref = jax.jit(flow.transform.inverse)(z)
    for packed in (False, "mm", "roll", "fat"):
        config.packed_spline_select(packed)
        fused = fuse_nsf(flow)
        tag = f"packed-{packed}" if packed else "unpacked"
        zf, lf = fused.forward(x)
        xf, li = fused.inverse(z)
        check(f"nsf {tag} fwd out", float(jnp.max(jnp.abs(zf - z_ref))), 5e-3)
        check(f"nsf {tag} fwd lad", float(jnp.max(jnp.abs(lf - lad_f_ref))), 2e-2)
        check(f"nsf {tag} inv out", float(jnp.max(jnp.abs(xf - x_ref))), 5e-3)
        check(f"nsf {tag} inv lad", float(jnp.max(jnp.abs(li - lad_i_ref))), 2e-2)
    config.packed_spline_select("auto")  # restore per-path defaults
    # (serving 'fat', training unpacked) so every later section gates
    # the SHIPPING configuration, not a forced style

    # --- cubic coupling through the DEFAULT (fat) serving path: a
    # different param-row count (2K+2 vs rq's 3K-1) exercises the fat
    # relayout's P reshape on hardware too ---
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.nn import nets
    from nflows_tpu.transforms import (
        CompositeTransform,
        PiecewiseCubicCouplingTransform,
        RandomPermutation,
    )

    crng = np.random.default_rng(4)
    ckeys = jax.random.split(jax.random.key(4), 4)
    cmask = np.ones(6, dtype=np.float32)
    cmask[::2] = -1
    cchain = []
    for i in range(4):
        def create(inf, outf, _k=ckeys[i]):
            return nets.ResidualNet(inf, outf, hidden_features=64,
                                    num_blocks=2, key=_k)
        cchain.append(RandomPermutation(6, rng=crng))
        cchain.append(PiecewiseCubicCouplingTransform(
            mask=cmask, transform_net_create_fn=create, num_bins=8,
            tails="linear", tail_bound=3.0))
        cmask = cmask * -1
    cub = Flow(transform=CompositeTransform(cchain),
               distribution=StandardNormal([6]))
    zc_ref, lc_ref = jax.jit(cub.transform.forward)(x)
    zc_f, lc_f = fuse_nsf(cub).forward(x)
    check("cubic fat-default fwd out",
          float(jnp.max(jnp.abs(zc_f - zc_ref))), 5e-3)
    check("cubic fat-default fwd lad",
          float(jnp.max(jnp.abs(lc_f - lc_ref))), 2e-2)

    # --- fused NSF training: loss+grads vs XLA autodiff on hardware ---
    tr = FusedNSFTrainer(flow, batch_size=128)
    xb = x[:128]
    loss_x = float(jax.jit(lambda b: -flow.log_prob(b).mean())(xb))
    loss_f, grads_f = tr._value_and_grad()(tr.weights, xb.T)
    check("nsf fused-train loss", abs(float(loss_f) - loss_x), 5e-3)
    # grad check: one-kernel fused grads vs the split custom_vjp path
    # (same layout), both Mosaic-compiled on this chip
    loss_f2, grads_f2 = jax.value_and_grad(tr.loss_fn)(tr.weights, xb.T)
    gerr = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(grads_f), jax.tree.leaves(grads_f2)))
    check("nsf fused-train grads (one-kernel vs split vjp)", gerr, 5e-3)

    # --- fused NSF training with the roll-based packed stage (round 5):
    # pltpu.roll/repeat structural moves are exact copies, so loss+grads
    # must sit in the same band as the unpacked kernel ---
    config.packed_spline_select("roll")
    tr_roll = FusedNSFTrainer(flow, batch_size=128)
    loss_r, grads_r = tr_roll._value_and_grad()(tr_roll.weights, xb.T)
    config.packed_spline_select("auto")
    check("nsf fused-train roll loss", abs(float(loss_r) - loss_x), 5e-3)
    gerr_r = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(grads_r), jax.tree.leaves(grads_f)))
    check("nsf fused-train roll grads (vs unpacked one-kernel)", gerr_r,
          5e-3)

    # --- conditional NSF serving ---
    cflow = NeuralSplineFlow(
        features=6, hidden_features=64, num_layers=4,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        context_features=3,
        key=jax.random.key(1), rng=np.random.default_rng(1))
    ctx = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    lp_ref = jax.jit(cflow.log_prob)(x, ctx)
    lp_f = fuse_nsf(cflow).log_prob(x, ctx)
    check("nsf conditional log_prob", float(jnp.max(jnp.abs(lp_ref - lp_f))),
          2e-2)

    # --- MAF: forward + D-step fixed-point inverse ---
    maf = MaskedAutoregressiveFlow(
        features=10, hidden_features=64, num_layers=3,
        num_blocks_per_layer=2, use_random_permutations=True,
        key=jax.random.key(2), rng=np.random.default_rng(2))
    xm = jnp.asarray(rng.normal(size=(N, 10)), jnp.float32)
    lp_ref = jax.jit(maf.log_prob)(xm)
    fm = fuse_maf(maf)
    lp_f = fm.log_prob(xm)
    check("maf log_prob", float(jnp.max(jnp.abs(lp_ref - lp_f))), 2e-2)
    # inverse: relative error (untrained MAF inverses amplify; see
    # BASELINE.md round-2 note)
    zm = jnp.asarray(rng.normal(size=(1024, 10)), jnp.float32)
    xi_ref, _ = jax.jit(maf.transform.inverse)(zm)
    xi_f, _ = fm.inverse(zm)
    rel = float(jnp.max(jnp.abs(xi_f - xi_ref) /
                        (1.0 + jnp.abs(xi_ref))))
    check("maf inverse (rel)", rel, 5e-3)

    # --- MADEMoG log_prob ---
    mog = MADEMoG(features=10, hidden_features=64, context_features=None,
                  num_blocks=2, num_mixture_components=8,
                  key=jax.random.key(3), rng=np.random.default_rng(3))
    lp_ref = jax.jit(mog.log_prob)(xm)
    lp_f = fuse_mademog(mog).log_prob(xm)
    check("mademog log_prob", float(jnp.max(jnp.abs(lp_ref - lp_f))), 2e-2)

    if FAILED:
        print(f"hw_numerics: {len(FAILED)} FAILED: {FAILED}", flush=True)
        return 1
    print("hw_numerics: all bands hold on this hardware", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
