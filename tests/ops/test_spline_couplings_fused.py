"""Linear / quadratic / cubic spline couplings in the whole-flow
megakernel (round 3): with these, EVERY coupling family the library ships
(RQ, LRS, linear, quadratic, cubic, affine, additive) has a fused serving
path. fp32 interpret-mode parity against the XLA chain; the XLA chain is
itself reference-parity-tested (tests/parity/), so agreement here chains
to the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.distributions import StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.nn import nets
from nflows_tpu.ops.pallas.nsf_fused import can_fuse_nsf, fuse_nsf
from nflows_tpu.transforms import (
    PiecewiseCubicCouplingTransform,
    PiecewiseLinearCouplingTransform,
    PiecewiseQuadraticCouplingTransform,
)
from nflows_tpu.transforms.base import CompositeTransform
from nflows_tpu.transforms.permutations import RandomPermutation

COUPLINGS = {
    "linear": (PiecewiseLinearCouplingTransform, {}),
    "quadratic": (PiecewiseQuadraticCouplingTransform, {}),
    "cubic": (PiecewiseCubicCouplingTransform, {}),
}

D = 6


def _flow(family, layers=4, bins=8, seed=0):
    cls, extra = COUPLINGS[family]
    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.key(seed), layers)
    mask = np.ones(D, dtype=np.float32)
    mask[::2] = -1
    chain = []
    for i in range(layers):
        def create(inf, outf, _k=keys[i]):
            return nets.ResidualNet(inf, outf, hidden_features=32,
                                    num_blocks=2, key=_k)
        chain.append(RandomPermutation(D, rng=rng))
        chain.append(cls(mask=mask, transform_net_create_fn=create,
                         num_bins=bins, tails="linear", tail_bound=3.0,
                         **extra))
        mask = mask * -1
    return Flow(transform=CompositeTransform(chain),
                distribution=StandardNormal([D]))


def _x(n=64, seed=0, scale=2.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, D)) * scale, jnp.float32)


@pytest.mark.parametrize("family", sorted(COUPLINGS))
def test_fused_matches_xla_chain(family):
    flow = _flow(family)
    assert can_fuse_nsf(flow)
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
    x = _x()

    y_ref, lad_ref = flow.transform.forward(x)
    y_f, lad_f = fused.forward(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f),
                               atol=2e-5, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=2e-4)

    z_ref, ladi_ref = flow.transform.inverse(x)
    z_f, ladi_f = fused.inverse(x)
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_f),
                               atol=2e-5, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(ladi_ref), np.asarray(ladi_f),
                               atol=2e-4)

    lp_ref = flow.log_prob(x)
    lp_f = fused.log_prob(x)
    np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_f),
                               atol=5e-4)


@pytest.mark.parametrize("family", sorted(COUPLINGS))
def test_fused_round_trip(family):
    flow = _flow(family, seed=1)
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
    x = _x(seed=2)
    y, lad_f = fused.forward(x)
    x_back, lad_i = fused.inverse(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_back), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad_f + lad_i), 0.0, atol=1e-3)


def test_fused_training_accepts_new_families():
    # round-3 session 2: every coupling family TRAINS fused (full
    # loss/grad/trajectory coverage in tests/ops/test_nsf_train_families.py)
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    tr = FusedNSFTrainer(_flow("quadratic"), batch_size=128, interpret=True)
    assert tr._static["spline"] == "quadratic"
