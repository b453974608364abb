"""Neural Spline Flow prebuilt — the flagship model.

RQ-spline coupling flow in the configuration of the NSF paper (Durkan et
al. 2019, arXiv:1906.04032), which the reference library implements
piecemeal (coupling.py:502-582) but never packages. Stack of
``num_layers`` x [random-feature permutation, RQ-spline coupling with
ResidualNet conditioner (alternating masks)], StandardNormal base.

This is the model `bench.py` and `__graft_entry__.py` run: all FLOPs are
conditioner GEMMs (MXU) and the fused spline kernel (VPU).
"""

from __future__ import annotations

import jax
import numpy as np

from nflows_tpu.distributions.normal import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.nn import nets
from nflows_tpu.nn.primitives import ensure_key
from nflows_tpu.transforms.base import CompositeTransform
from nflows_tpu.transforms.coupling import (
    PiecewiseLinearRationalCouplingTransform,
    PiecewiseRationalQuadraticCouplingTransform,
)
from nflows_tpu.transforms.permutations import RandomPermutation, ReversePermutation
from nflows_tpu.utils.masks import create_alternating_binary_mask

__all__ = ["NeuralSplineFlow"]


class NeuralSplineFlow(Flow):
    """NSF (coupling) for tabular data: RQ splines by default, or the
    linear-rational family (``spline="lrs"``, beyond the reference)."""

    # Measured stacked-vs-unrolled crossover (benchmarks/bench_stacked.py,
    # BASELINE.md round 2/3): the scan-stacked chain wins throughput AND
    # compile time up to hidden=256 (+18%, ~50x compile), the unrolled
    # chain wins at hidden>=512 (1.8x at batch 512). stacked=None picks
    # the winner from the conditioner width; pass True/False to override.
    STACKED_MAX_HIDDEN = 384

    def __init__(self, features, hidden_features, num_layers=10,
                 num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
                 context_features=None, use_random_permutations=True,
                 key=None, activation=jax.nn.relu, dropout_probability=0.0,
                 batch_norm_within_layers=False, rng=None, spline="rq",
                 stacked=None):
        key = ensure_key(key)
        if stacked is None:
            stacked = (hidden_features <= self.STACKED_MAX_HIDDEN
                       and (features % 2 == 0 or use_random_permutations))
        keys = jax.random.split(key, num_layers)
        if rng is None:
            # derive permutation/1x1-conv randomness from `key` so
            # different keys give different permutations, reproducibly
            rng = np.random.default_rng(
                np.asarray(jax.random.key_data(key)).ravel())

        # Odd feature counts: alternating-parity masks would give 11/10 vs
        # 10/11 splits with differing leaf shapes, which the scan-stacked
        # layout (and the fused megakernel) can't take. Since a random
        # feature permutation precedes EVERY coupling, a fixed
        # ceil(d/2)/floor(d/2) split in every layer mixes just as well —
        # so the stacked path pins the mask parity and stays homogeneous
        # (round-3 change; HEPMASS/MINIBOONE/BSDS300 now run stacked).
        fixed_parity = stacked and features % 2 == 1
        if fixed_parity and not use_random_permutations:
            raise ValueError(
                "stacked=True with an odd feature count requires "
                "use_random_permutations=True: reversal preserves index "
                "parity at odd d, so a fixed checkerboard mask would keep "
                "the same features on the identity side in every layer."
            )

        layers = []
        for i in range(num_layers):
            if use_random_permutations:
                layers.append(RandomPermutation(features, rng=rng))
            else:
                layers.append(ReversePermutation(features))
            layer_key = keys[i]

            def create_net(in_f, out_f, _k=layer_key):
                return nets.ResidualNet(
                    in_f, out_f,
                    hidden_features=hidden_features,
                    context_features=context_features,
                    num_blocks=num_blocks_per_layer,
                    key=_k,
                    activation=activation,
                    dropout_probability=dropout_probability,
                    use_batch_norm=batch_norm_within_layers,
                )

            if spline == "rq":
                coupling_cls = PiecewiseRationalQuadraticCouplingTransform
            elif spline == "lrs":  # linear-rational (beyond the reference)
                coupling_cls = PiecewiseLinearRationalCouplingTransform
            else:
                raise ValueError(f"spline must be 'rq' or 'lrs', got {spline!r}")
            layers.append(coupling_cls(
                mask=create_alternating_binary_mask(
                    features, even=False if fixed_parity else bool(i % 2)),
                transform_net_create_fn=create_net,
                num_bins=num_bins,
                tails="linear",
                tail_bound=tail_bound,
            ))

        if stacked:
            # one [permutation, coupling] group per layer, stacked leaf-wise
            # into a single lax.scan chain: the compiled program contains the
            # conditioner once instead of num_layers times (same numerics as
            # the unrolled CompositeTransform — tests/transforms/test_stacked.py)
            from nflows_tpu.transforms.stacked import stack_transforms
            groups = [
                CompositeTransform(layers[2 * i: 2 * i + 2])
                for i in range(num_layers)
            ]
            transform = stack_transforms(groups)
        else:
            transform = CompositeTransform(layers)

        super().__init__(
            transform=transform,
            distribution=StandardNormal([features]),
        )

    def fused(self, dtype=None, lanes=1024, interpret=None):
        """Megakernel-backed inference view of this flow.

        Returns a :class:`~nflows_tpu.ops.pallas.nsf_fused.FusedNSF` whose
        ``sample`` / ``log_prob`` / ``sample_and_log_prob`` / ``forward`` /
        ``inverse`` run the ENTIRE transform chain as one Pallas kernel
        (weights resident in VMEM, samples on lanes) — measured 1.5x the
        XLA chain end-to-end on TPU (benchmarks/bench_fused_nsf.py).

        Deliberately explicit rather than an automatic default: extraction
        does one device->host pass over the weights, which only amortizes
        when the SAME trained flow serves many inference calls (the
        deployment pattern). ``dtype`` defaults to bf16 conditioner GEMMs —
        the training precision; pass ``jnp.float32`` for full precision.
        """
        from nflows_tpu.ops.pallas.nsf_fused import fuse_nsf
        kwargs = {} if dtype is None else {"dtype": dtype}
        return fuse_nsf(self, lanes=lanes, interpret=interpret, **kwargs)
