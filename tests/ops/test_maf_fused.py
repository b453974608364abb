"""Fused whole-flow MAF kernel (interpret mode on CPU) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.flows import MaskedAutoregressiveFlow
from nflows_tpu.ops.pallas.maf_fused import can_fuse_maf, fuse_maf


def _flow(features=5, hidden=32, layers=3, seed=0, **kw):
    return MaskedAutoregressiveFlow(
        features=features, hidden_features=hidden, num_layers=layers,
        num_blocks_per_layer=2, key=jax.random.key(seed), **kw)


@pytest.fixture(scope="module")
def flow():
    return _flow()


@pytest.fixture(scope="module")
def fused(flow):
    return fuse_maf(flow, dtype=jnp.float32, lanes=128, interpret=True)


def test_forward_matches_xla(flow, fused):
    x = jnp.asarray(np.random.default_rng(1).normal(size=(100, 5)),
                    dtype=jnp.float32)
    y_ref, lad_ref = flow.transform.forward(x)
    y_f, lad_f = fused.forward(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-5)


def test_inverse_matches_xla(flow, fused):
    z = jnp.asarray(np.random.default_rng(2).normal(size=(100, 5)),
                    dtype=jnp.float32)
    x_ref, lad_ref = flow.transform.inverse(z)
    x_f, lad_f = fused.inverse(z)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-5)
    # and the inverse really inverts the forward
    y, _ = fused.forward(x_f)
    np.testing.assert_allclose(np.asarray(y), np.asarray(z), atol=1e-4)


def test_log_prob_and_sample_match(flow, fused):
    x = jnp.asarray(np.random.default_rng(3).normal(size=(64, 5)),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(flow.log_prob(x)),
                               np.asarray(fused.log_prob(x)), atol=1e-5)
    s_ref = flow.sample(jax.random.key(4), 50)
    s_f = fused.sample(jax.random.key(4), 50)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_f), atol=1e-4)
    s, lp = fused.sample_and_log_prob(jax.random.key(5), 50)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(fused.log_prob(s)),
                               atol=1e-4)


def test_random_permutations_and_ragged_batch():
    # random (non-involutive) permutations: exercises perm_rows vs
    # inv_perm_rows in BOTH directions — reverse permutations are
    # self-inverse and would mask a swapped-gather regression
    flow = _flow(use_random_permutations=True,
                 rng=np.random.default_rng(7))
    fused = fuse_maf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    for n in (1, 127, 129):
        x = jnp.asarray(np.random.default_rng(n).normal(size=(n, 5)),
                        dtype=jnp.float32)
        y_ref, _ = flow.transform.forward(x)
        y_f, _ = fused.forward(x)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f),
                                   atol=1e-5)
    z = jnp.asarray(np.random.default_rng(77).normal(size=(64, 5)),
                    dtype=jnp.float32)
    x_ref, lad_ref = flow.transform.inverse(z)
    x_f, lad_f = fused.inverse(z)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_f), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-4)


def test_can_fuse_rejects_unsupported(flow):
    assert can_fuse_maf(flow)
    assert not can_fuse_maf(_flow(batch_norm_between_layers=True))
    assert not can_fuse_maf(_flow(use_residual_blocks=False))
    from nflows_tpu.models import NeuralSplineFlow
    assert not can_fuse_maf(NeuralSplineFlow(
        features=6, hidden_features=16, num_layers=2,
        key=jax.random.key(0), rng=np.random.default_rng(0)))


def test_errors(fused):
    with pytest.raises(ValueError):
        fused.forward(jnp.ones((4, 4)))
    with pytest.raises(ValueError):
        fused.sample(jax.random.key(0), 8, context=jnp.ones((2, 1)))


def test_nsf_ar_fuses_and_matches_xla():
    """RQ-spline AR transformer (NSF-AR model family) in the AR megakernel:
    the fixed-point inverse runs the full spline per iteration."""
    from nflows_tpu.models import NeuralSplineFlowAR

    flow = NeuralSplineFlowAR(features=5, hidden_features=32, num_layers=3,
                              num_blocks_per_layer=2, num_bins=4,
                              tail_bound=3.0, key=jax.random.key(0),
                              rng=np.random.default_rng(0))
    assert can_fuse_maf(flow)
    fused = fuse_maf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(100, 5)) * 2,
                    dtype=jnp.float32)
    y_ref, lad_ref = flow.transform.forward(x)
    y_f, lad_f = fused.forward(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-4)
    z = jnp.asarray(np.random.default_rng(2).normal(size=(100, 5)),
                    dtype=jnp.float32)
    x_ref, ladi_ref = flow.transform.inverse(z)
    x_f, ladi_f = fused.inverse(z)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ladi_ref), np.asarray(ladi_f),
                               atol=1e-4)
    # LU-linear interleave is NOT fusable (triples, not pairs)
    assert not can_fuse_maf(NeuralSplineFlowAR(
        features=4, hidden_features=16, num_layers=2, num_bins=4,
        use_linear_layers=True, key=jax.random.key(1),
        rng=np.random.default_rng(1)))


def test_iaf_fuses_and_matches_xla():
    """InverseTransform-wrapped AR layers (IAF): single MADE pass to
    sample, fixed point for log_prob — the kernel swaps the elementwise
    direction per branch."""
    from nflows_tpu.models import InverseAutoregressiveFlow

    flow = InverseAutoregressiveFlow(features=5, hidden_features=32,
                                     num_layers=3, num_blocks_per_layer=2,
                                     key=jax.random.key(0))
    assert can_fuse_maf(flow)
    fused = fuse_maf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(80, 5)),
                    dtype=jnp.float32)
    y_ref, lad_ref = flow.transform.forward(x)
    y_f, lad_f = fused.forward(x)
    # the forward here is the FIXED-POINT direction; an untrained IAF
    # amplifies outliers, so compare relatively
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-3)
    s_ref = flow.sample(jax.random.key(3), 32)
    s_f = fused.sample(jax.random.key(3), 32)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_f), atol=1e-4)
    np.testing.assert_allclose(np.asarray(flow.log_prob(x)),
                               np.asarray(fused.log_prob(x)),
                               rtol=1e-4, atol=1e-3)


# -- conditional AR megakernel (round 3) -----------------------------------


def _cond_maf(features=5, hidden=32, layers=3, ctx=3, seed=0):
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.transforms import (
        CompositeTransform,
        MaskedAffineAutoregressiveTransform,
        RandomPermutation,
    )

    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.key(seed), layers)
    chain = []
    for i in range(layers):
        chain.append(RandomPermutation(features, rng=rng))
        chain.append(MaskedAffineAutoregressiveTransform(
            features=features, hidden_features=hidden, context_features=ctx,
            num_blocks=2, key=keys[i]))
    return Flow(transform=CompositeTransform(chain),
                distribution=StandardNormal([features]))


def test_conditional_maf_matches_xla():
    """The additive MADE context projections (precomputed once per layer
    in-kernel) must reproduce the XLA chain in both directions."""
    flow = _cond_maf()
    fused = fuse_maf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    assert fused.context_features == 3
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(100, 5)), dtype=jnp.float32)
    c = jnp.asarray(rng.normal(size=(100, 3)), dtype=jnp.float32)

    y_ref, lad_ref = flow.transform.forward(x, c)
    y_f, lad_f = fused.forward(x, c)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-5)

    z_ref, ladi_ref = flow.transform.inverse(x, c)
    z_f, ladi_f = fused.inverse(x, c)
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_f), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ladi_ref), np.asarray(ladi_f),
                               atol=1e-4)

    np.testing.assert_allclose(np.asarray(flow.log_prob(x, c)),
                               np.asarray(fused.log_prob(x, c)), atol=1e-5)


def test_conditional_maf_sampling_layout():
    """sample(key, n, context) must agree with the XLA endpoint
    sample-for-sample ([M, n, D] with the same key stream)."""
    flow = _cond_maf(layers=2, hidden=16)
    fused = fuse_maf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    c = jnp.asarray(np.random.default_rng(12).normal(size=(4, 3)),
                    dtype=jnp.float32)
    s_ref = flow.sample(jax.random.key(7), 10, context=c)
    s_f = fused.sample(jax.random.key(7), 10, context=c)
    assert s_f.shape == (4, 10, 5)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_f), atol=1e-4)
    s, lp = fused.sample_and_log_prob(jax.random.key(8), 6, context=c)
    lp_chk = fused.log_prob(s.reshape(-1, 5),
                            jnp.repeat(c, 6, axis=0)).reshape(4, 6)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_chk), atol=1e-4)


def test_conditional_nsf_ar_matches_xla():
    from nflows_tpu.models import NeuralSplineFlowAR

    flow = NeuralSplineFlowAR(features=5, hidden_features=16, num_layers=2,
                              num_blocks_per_layer=2, num_bins=4,
                              tail_bound=3.0, context_features=2,
                              key=jax.random.key(0),
                              rng=np.random.default_rng(0))
    assert can_fuse_maf(flow)
    fused = fuse_maf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(64, 5)) * 2, dtype=jnp.float32)
    c = jnp.asarray(rng.normal(size=(64, 2)), dtype=jnp.float32)
    y_ref, lad_ref = flow.transform.forward(x, c)
    y_f, lad_f = fused.forward(x, c)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-4)
    z_ref, ladi_ref = flow.transform.inverse(x, c)
    z_f, ladi_f = fused.inverse(x, c)
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ladi_ref), np.asarray(ladi_f),
                               atol=1e-4)


def test_conditional_context_errors():
    flow = _cond_maf(layers=2, hidden=16)
    fused = fuse_maf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    x = jnp.ones((8, 5))
    with pytest.raises(ValueError, match="conditional"):
        fused.forward(x)  # missing context
    with pytest.raises(ValueError, match="rows"):
        fused.forward(x, jnp.ones((5, 3)))  # batch mismatch
