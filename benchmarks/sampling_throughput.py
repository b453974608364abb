"""Sampling / image-flow throughput: nflows_tpu (TPU) vs reference (CPU).

Covers the two remaining hot paths not measured elsewhere:

1. MAF ancestral sampling — the D-sequential-pass autoregressive inverse
   (reference nflows/transforms/autoregressive.py:43-52 runs D Python-level
   MADE passes; ours is one XLA fori_loop of fused passes).
2. Glow-style multiscale image flow (squeeze + actnorm + 1x1 conv + conv
   coupling): log_prob (training direction) and sampling, NCHW 3x32x32.
   The reference ships the parts but no assembled model; we assemble the
   identical architecture from its own components.

Usage: python benchmarks/sampling_throughput.py
"""

import json
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")


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


FEATURES, HIDDEN, LAYERS = 10, 256, 5
N_SAMPLES = 4096
IMG = (3, 32, 32)
IMG_BATCH = 64


def maf_ours():
    import jax
    import jax.numpy as jnp
    from nflows_tpu.flows import MaskedAutoregressiveFlow

    flow = MaskedAutoregressiveFlow(
        features=FEATURES, hidden_features=HIDDEN, num_layers=LAYERS,
        num_blocks_per_layer=2, key=jax.random.key(0),
    )
    fn = jax.jit(lambda f, k: f._sample(k, N_SAMPLES, None))
    out = fn(flow, jax.random.key(1))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(10):
        out = fn(flow, jax.random.key(i))
    jax.block_until_ready(out)
    return 10 * N_SAMPLES / (time.perf_counter() - t0)


def maf_reference():
    torch = _ref_setup()
    from nflows.flows import MaskedAutoregressiveFlow

    flow = MaskedAutoregressiveFlow(
        features=FEATURES, hidden_features=HIDDEN, num_layers=LAYERS,
        num_blocks_per_layer=2,
    )
    flow.eval()
    with torch.no_grad():
        flow.sample(256)  # warmup
        t0 = time.perf_counter()
        flow.sample(N_SAMPLES)
        return N_SAMPLES / (time.perf_counter() - t0)


def _glow_config():
    return dict(num_levels=2, steps_per_level=4, hidden_channels=64,
                coupling="affine")


def glow_ours():
    import jax
    import jax.numpy as jnp
    from nflows_tpu.models import GlowFlow

    cfg = _glow_config()
    flow = GlowFlow(IMG, key=jax.random.key(0), rng=np.random.default_rng(0),
                    **cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(IMG_BATCH, *IMG)),
                    dtype=jnp.float32)
    flow = flow.initialize_actnorms(x)

    lp_fn = jax.jit(lambda f, x: f.log_prob(x))
    s_fn = jax.jit(lambda f, k: f._sample(k, IMG_BATCH, None))

    out = lp_fn(flow, x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = lp_fn(flow, x)
    jax.block_until_ready(out)
    lp_ips = 20 * IMG_BATCH / (time.perf_counter() - t0)

    out = s_fn(flow, jax.random.key(1)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(20):
        out = s_fn(flow, jax.random.key(i))
    jax.block_until_ready(out)
    s_ips = 20 * IMG_BATCH / (time.perf_counter() - t0)
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
    total = c * h * w
    flow = Flow(mct, StandardNormal([total]))

    x = torch.randn(IMG_BATCH, *IMG)
    flow.eval()
    with torch.no_grad():
        flow.log_prob(x)  # warmup + actnorm init happens in train mode; ok for timing
        t0 = time.perf_counter()
        for _ in range(3):
            flow.log_prob(x)
        lp_ips = 3 * IMG_BATCH / (time.perf_counter() - t0)
        flow.sample(8)
        t0 = time.perf_counter()
        flow.sample(IMG_BATCH)
        s_ips = IMG_BATCH / (time.perf_counter() - t0)
    return lp_ips, s_ips


def main():
    ours_maf = maf_ours()
    ref_maf = maf_reference()
    ours_lp, ours_s = glow_ours()
    ref_lp, ref_s = glow_reference()
    print(json.dumps({
        "maf_sampling_samples_per_s": {
            "config": f"MAF {LAYERS}x{HIDDEN}, d={FEATURES}, {N_SAMPLES} samples",
            "nflows_tpu": round(ours_maf),
            "reference": round(ref_maf),
            "speedup": round(ours_maf / ref_maf, 1),
        },
        "glow_3x32x32_images_per_s": {
            "config": "2 levels x 4 steps, hidden 64, affine conv coupling",
            "log_prob": {"nflows_tpu": round(ours_lp), "reference": round(ref_lp, 1),
                         "speedup": round(ours_lp / ref_lp, 1)},
            "sample": {"nflows_tpu": round(ours_s), "reference": round(ref_s, 1),
                       "speedup": round(ours_s / ref_s, 1)},
        },
    }, indent=2))


if __name__ == "__main__":
    main()
