"""Sampling / inference / image-flow throughput: nflows_tpu (TPU) vs reference (CPU).

Covers the hot paths not measured by bench.py:

1. MAF ancestral sampling — the D-sequential-pass autoregressive inverse
   (reference nflows/transforms/autoregressive.py:43-52 runs D Python-level
   MADE passes; ours is one XLA fori_loop of fused passes).
2. NSF coupling-flow inference: `sample` (coupling inverse) and `log_prob`.
3. Glow-style multiscale image flow (squeeze + actnorm + 1x1 conv + conv
   coupling): log_prob (training direction) and sampling, NCHW 3x32x32.
   The reference ships the parts but no assembled model; we assemble the
   identical architecture from its own components.

Timing protocol: dispatch -> element fetch per rep (benchmarks/_timing.py —
block_until_ready is not a sound fence on this remote backend), fresh PRNG
keys per rep, large batches so the ~50 ms fetch round-trip is amortized.

Usage: python benchmarks/sampling_throughput.py
"""

import json
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")


def _tpu_setup():
    """Standard TPU inference configuration: bf16 MXU matmuls with fp32
    accumulation (same policy as bench.py's training loop); spline/logdet
    elementwise numerics stay fp32 on the VPU."""
    import jax
    jax.config.update("jax_default_matmul_precision", "bfloat16")


def _ref_setup():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "UMNN" not in sys.modules:
        stub = types.ModuleType("UMNN")
        stub.NeuralIntegral = object
        stub.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = stub
    import torch
    torch.manual_seed(0)
    torch.set_num_threads(8)
    return torch


from benchmarks._timing import timeit_calls


def _rate(dispatches, fetch, items, reps=3):
    """items/s; index ``reps`` is the warmup call, 0..reps-1 are timed
    (all with fresh inputs — see benchmarks/_timing.py)."""
    args_list = [(i,) for i in range(reps)] + [(reps,)]
    return items / timeit_calls(dispatches, args_list, fetch)


FEATURES, HIDDEN, LAYERS = 10, 256, 5
N_AR = 1 << 18        # MAF sampling batch
N_NSF = 1 << 20       # NSF inference batch
IMG = (3, 32, 32)
IMG_BATCH = 512


def maf_ours():
    _tpu_setup()
    import jax
    from nflows_tpu.flows import MaskedAutoregressiveFlow

    flow = MaskedAutoregressiveFlow(
        features=FEATURES, hidden_features=HIDDEN, num_layers=LAYERS,
        num_blocks_per_layer=2, key=jax.random.key(0),
    )
    fn = jax.jit(lambda f, k: f._sample(k, N_AR, None))
    return _rate(lambda i: fn(flow, jax.random.key(i)),
                 lambda out: float(out[-1, -1]), N_AR)


def maf_reference():
    torch = _ref_setup()
    from nflows.flows import MaskedAutoregressiveFlow

    flow = MaskedAutoregressiveFlow(
        features=FEATURES, hidden_features=HIDDEN, num_layers=LAYERS,
        num_blocks_per_layer=2,
    )
    n = 4096  # CPU: keep the timed call tractable (~2 s)
    flow.eval()
    with torch.no_grad():
        flow.sample(256)  # warmup
        t0 = time.perf_counter()
        flow.sample(n)
        return n / (time.perf_counter() - t0)


def nsf_ours():
    _tpu_setup()
    import jax
    import jax.numpy as jnp
    from nflows_tpu.models import NeuralSplineFlow

    flow = NeuralSplineFlow(
        features=6, hidden_features=256, num_layers=10,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0),
    )
    s_fn = jax.jit(lambda f, k: f._sample(k, N_NSF, None))
    sample_rate = _rate(lambda i: s_fn(flow, jax.random.key(i)),
                        lambda out: float(out[-1, -1]), N_NSF)

    lp_fn = jax.jit(lambda f, x: f.log_prob(x))
    xs = [jnp.asarray(np.random.default_rng(i).normal(size=(N_NSF, 6)),
                      dtype=jnp.float32) for i in range(4)]
    lp_rate = _rate(lambda i: lp_fn(flow, xs[i]),
                    lambda out: float(out[-1]), N_NSF)
    return sample_rate, lp_rate


def nsf_reference():
    torch = _ref_setup()
    from benchmarks.uci_nsf_throughput import build_reference_nsf

    flow = build_reference_nsf(features=6)
    flow.eval()
    n = 8192
    with torch.no_grad():
        flow.sample(256)
        t0 = time.perf_counter()
        flow.sample(n)
        s_rate = n / (time.perf_counter() - t0)
        x = torch.randn(n, 6)
        flow.log_prob(x[:256])
        t0 = time.perf_counter()
        flow.log_prob(x)
        lp_rate = n / (time.perf_counter() - t0)
    return s_rate, lp_rate


def _glow_config():
    return dict(num_levels=2, steps_per_level=4, hidden_channels=64,
                coupling="affine")


def glow_ours():
    _tpu_setup()
    import jax
    import jax.numpy as jnp
    from nflows_tpu.models import GlowFlow

    cfg = _glow_config()
    flow = GlowFlow(IMG, key=jax.random.key(0), rng=np.random.default_rng(0),
                    **cfg)
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=(IMG_BATCH, *IMG)),
                     dtype=jnp.float32)
    flow = flow.initialize_actnorms(x0)

    lp_fn = jax.jit(lambda f, x: f.log_prob(x))
    xs = [jnp.asarray(np.random.default_rng(i).normal(size=(IMG_BATCH, *IMG)),
                      dtype=jnp.float32) for i in range(4)]
    lp_ips = _rate(lambda i: lp_fn(flow, xs[i]),
                   lambda out: float(out[-1]), IMG_BATCH)

    s_fn = jax.jit(lambda f, k: f._sample(k, IMG_BATCH, None))
    s_ips = _rate(lambda i: s_fn(flow, jax.random.key(i)),
                  lambda out: float(out.reshape(-1)[-1]), IMG_BATCH)
    return lp_ips, s_ips


def glow_reference():
    torch = _ref_setup()
    from nflows import transforms
    from nflows.distributions import StandardNormal
    from nflows.flows import Flow
    from nflows.nn import nets
    from nflows.utils import create_mid_split_binary_mask

    cfg = _glow_config()
    c, h, w = IMG
    mct = transforms.MultiscaleCompositeTransform(
        num_transforms=cfg["num_levels"])
    shape = (c, h, w)
    for level in range(cfg["num_levels"]):
        sc, sh, sw = 4 * shape[0], shape[1] // 2, shape[2] // 2
        layers = [transforms.SqueezeTransform(factor=2)]
        for _ in range(cfg["steps_per_level"]):
            layers.append(transforms.ActNorm(sc))
            layers.append(transforms.OneByOneConvolution(sc))
            layers.append(transforms.AffineCouplingTransform(
                mask=create_mid_split_binary_mask(sc),
                transform_net_create_fn=lambda i, o: nets.ConvResidualNet(
                    i, o, hidden_channels=cfg["hidden_channels"], num_blocks=2),
            ))
        next_shape = mct.add_transform(
            transforms.CompositeTransform(layers), (sc, sh, sw))
        shape = next_shape
    flow = Flow(mct, StandardNormal([c * h * w]))

    n = 64
    x = torch.randn(n, *IMG)
    flow.eval()
    with torch.no_grad():
        flow.log_prob(x[:8])
        t0 = time.perf_counter()
        flow.log_prob(x)
        lp_ips = n / (time.perf_counter() - t0)
        flow.sample(8)
        t0 = time.perf_counter()
        flow.sample(n)
        s_ips = n / (time.perf_counter() - t0)
    return lp_ips, s_ips


def main():
    ours_maf = maf_ours()
    ours_nsf_s, ours_nsf_lp = nsf_ours()
    ours_glow_lp, ours_glow_s = glow_ours()
    ref_maf = maf_reference()
    ref_nsf_s, ref_nsf_lp = nsf_reference()
    ref_glow_lp, ref_glow_s = glow_reference()
    print(json.dumps({
        "maf_ar_sampling_samples_per_s": {
            "config": f"MAF {LAYERS}x{HIDDEN}, d={FEATURES}",
            "nflows_tpu": round(ours_maf),
            "reference": round(ref_maf),
            "speedup": round(ours_maf / ref_maf, 1),
        },
        "nsf_inference_per_s": {
            "config": "RQ-NSF coupling 10x256, d=6 (bench.py config)",
            "sample": {"nflows_tpu": round(ours_nsf_s),
                       "reference": round(ref_nsf_s),
                       "speedup": round(ours_nsf_s / ref_nsf_s, 1)},
            "log_prob": {"nflows_tpu": round(ours_nsf_lp),
                         "reference": round(ref_nsf_lp),
                         "speedup": round(ours_nsf_lp / ref_nsf_lp, 1)},
        },
        "glow_3x32x32_images_per_s": {
            "config": "2 levels x 4 steps, hidden 64, affine conv coupling",
            "log_prob": {"nflows_tpu": round(ours_glow_lp),
                         "reference": round(ref_glow_lp, 1),
                         "speedup": round(ours_glow_lp / ref_glow_lp, 1)},
            "sample": {"nflows_tpu": round(ours_glow_s),
                       "reference": round(ref_glow_s, 1),
                       "speedup": round(ours_glow_s / ref_glow_s, 1)},
        },
    }, indent=2))


if __name__ == "__main__":
    main()
