"""Glow-style multiscale image flow prebuilt.

The reference ships all the parts (SqueezeTransform, ActNorm,
OneByOneConvolution, conv coupling, MultiscaleCompositeTransform) but never
a packaged image model; this assembles them in the Glow configuration
(Kingma & Dhariwal 2018): per level, squeeze then K x [ActNorm -> 1x1 conv
-> coupling(ConvResidualNet)], splitting off half the channels between
levels. Outputs are flattened (multiscale convention).

Call ``flow = flow.initialize_actnorms(batch)`` once with a data batch
before training (explicit data-dependent init — ActNorm state is immutable).
"""

from __future__ import annotations

import jax
import numpy as np

from nflows_tpu.distributions.normal import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.nn.nets import ConvResidualNet
from nflows_tpu.nn.primitives import ensure_key
from nflows_tpu.transforms.base import CompositeTransform, MultiscaleCompositeTransform
from nflows_tpu.transforms.conv import OneByOneConvolution
from nflows_tpu.transforms.coupling import (
    AffineCouplingTransform,
    PiecewiseRationalQuadraticCouplingTransform,
)
from nflows_tpu.transforms.normalization import ActNorm
from nflows_tpu.transforms.reshape import SqueezeTransform
from nflows_tpu.utils.masks import create_mid_split_binary_mask

__all__ = ["GlowFlow"]


class GlowFlow(Flow):
    """Multiscale Glow for NCHW images of shape (C, H, W).

    ``conv_layout`` precedence: ``None`` (default) auto-picks the
    measured-fastest per-instance layout per coupling family, which takes
    priority over the global ``config.conv_layout()`` toggle — pass
    ``conv_layout='auto'`` to defer to the global setting instead, or
    ``'nchw'``/``'nhwc'`` to pin one explicitly.
    """

    def __init__(self, image_shape, num_levels=2, steps_per_level=4,
                 hidden_channels=64, coupling="affine", num_bins=4,
                 key=None, rng=None, stacked=False, conv_layout=None):
        # conv_layout=None auto-picks the measured-fastest internal conv
        # layout per coupling family (benchmarks/bench_glow_layout.py,
        # TPU v5-lite 2026-08-20): NHWC wins for affine couplings
        # (134.8k vs 129.4k img/s), NCHW for spline couplings (102.2k vs
        # 98.3k). Arrays stay NCHW at every module boundary either way.
        if conv_layout is None:
            conv_layout = "nhwc" if coupling == "affine" else "nchw"
        key = ensure_key(key)
        if rng is None:
            # derive permutation/1x1-conv randomness from `key` so
            # different keys give different permutations, reproducibly
            rng = np.random.default_rng(
                np.asarray(jax.random.key_data(key)).ravel())
        c, h, w = image_shape
        keys = jax.random.split(key, num_levels * steps_per_level + 1)

        builder = MultiscaleCompositeTransform.builder(num_transforms=num_levels)
        shape = (c, h, w)
        k_idx = 0
        for level in range(num_levels):
            squeeze = SqueezeTransform(factor=2)
            sc, sh, sw = squeeze.get_output_shape(*shape)
            steps = []
            for _ in range(steps_per_level):
                layer_key = keys[k_idx]
                k_idx += 1
                step = [ActNorm(sc),
                        OneByOneConvolution(sc, rng=rng, key=layer_key)]

                def create_net(in_c, out_c, _k=layer_key):
                    return ConvResidualNet(in_c, out_c,
                                           hidden_channels=hidden_channels,
                                           num_blocks=2, key=_k,
                                           conv_layout=conv_layout)

                mask = create_mid_split_binary_mask(sc)
                if coupling == "affine":
                    step.append(AffineCouplingTransform(mask, create_net))
                elif coupling == "rq":
                    step.append(
                        PiecewiseRationalQuadraticCouplingTransform(
                            mask, create_net, num_bins=num_bins,
                            tails="linear", tail_bound=3.0))
                else:
                    raise ValueError(f"unknown coupling {coupling!r}")
                steps.append(step)
            if stacked:
                # the per-level [ActNorm, 1x1conv, coupling] steps are
                # homogeneous: run them as one lax.scan (the image analogue
                # of the tabular stacked fast path — compile time drops by
                # ~steps_per_level, the conv weights stay MXU-resident)
                from nflows_tpu.transforms.stacked import stack_transforms
                level_layers = [squeeze, stack_transforms(
                    [CompositeTransform(s) for s in steps])]
            else:
                level_layers = [squeeze] + [t for s in steps for t in s]
            next_shape = builder.add_transform(
                CompositeTransform(level_layers), (sc, sh, sw))
            if next_shape is not None:
                shape = next_shape

        transform = builder.build()
        super().__init__(
            transform=transform,
            distribution=StandardNormal([c * h * w]),
        )

    def initialize_actnorms(self, batch) -> "GlowFlow":
        """Data-dependent ActNorm init; returns an initialized copy."""
        new_transform, _ = self.transform.initialize_with_data(batch)
        return self.replace(transform=new_transform)
