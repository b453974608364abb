"""Fused whole-flow NSF kernel (interpret mode on CPU) vs the XLA path.

The compiled Mosaic path is exercised on real TPU by
benchmarks/bench_fused_nsf.py; these tests pin the kernel's numerics and
the extraction logic (weight re-layout, K-major param reorder, softmax
scale folding, composed static gathers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_fused import can_fuse_nsf, fuse_nsf


def _flow(features=6, hidden=32, layers=4, bins=8, seed=0, **kw):
    return NeuralSplineFlow(
        features=features, hidden_features=hidden, num_layers=layers,
        num_blocks_per_layer=2, num_bins=bins, tail_bound=3.0,
        key=jax.random.key(seed), rng=np.random.default_rng(seed), **kw)


@pytest.fixture(scope="module")
def flow():
    return _flow()


@pytest.fixture(scope="module")
def fused(flow):
    return fuse_nsf(flow, dtype=jnp.float32, lanes=128, interpret=True)


def test_forward_matches_xla(flow, fused):
    x = jnp.asarray(np.random.default_rng(1).normal(size=(100, 6)) * 2,
                    dtype=jnp.float32)
    y_ref, lad_ref = flow.transform.forward(x)
    y_f, lad_f = fused.forward(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f), atol=1e-4)


def test_inverse_matches_xla(flow, fused):
    z = jnp.asarray(np.random.default_rng(2).normal(size=(100, 6)),
                    dtype=jnp.float32)
    x_ref, lad_ref = flow.transform.inverse(z)
    x_f, lad_f = fused.inverse(z)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f), atol=1e-4)


def test_log_prob_and_sample_match(flow, fused):
    x = jnp.asarray(np.random.default_rng(3).normal(size=(64, 6)),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(flow.log_prob(x)),
                               np.asarray(fused.log_prob(x)), atol=1e-4)
    s_ref = flow.sample(jax.random.key(4), 50)
    s_f = fused.sample(jax.random.key(4), 50)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_f), atol=1e-5)
    s, lp = fused.sample_and_log_prob(jax.random.key(5), 50)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(fused.log_prob(s)),
                               atol=1e-4)


def test_tail_region_is_permutation_with_zero_logdet(fused):
    # elements outside [-tail_bound, tail_bound]: every spline evaluation
    # is in the linear tail, so the chain reduces to its permutations —
    # the output is a permutation of the input and logdet is exactly 0
    x = jnp.asarray([[10.0, -7.0, 8.5, -12.0, 9.0, 11.0]], dtype=jnp.float32)
    y, lad = fused.forward(x)
    np.testing.assert_allclose(sorted(np.asarray(y).ravel()),
                               sorted(np.asarray(x).ravel()), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad), [0.0], atol=1e-5)


def test_stacked_flow_fuses_too():
    flow = _flow(stacked=True)
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(32, 6)),
                    dtype=jnp.float32)
    y_ref, _ = flow.transform.forward(x)
    y_f, _ = fused.forward(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)


def test_ragged_batch_padding(fused, flow):
    # batch not a multiple of lanes (128): padding must not leak
    for n in (1, 127, 129):
        x = jnp.asarray(np.random.default_rng(n).normal(size=(n, 6)),
                        dtype=jnp.float32)
        y_ref, _ = flow.transform.forward(x)
        y_f, _ = fused.forward(x)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f),
                                   atol=1e-5)


def test_can_fuse_rejects_unsupported():
    assert can_fuse_nsf(_flow())
    assert can_fuse_nsf(_flow(spline="lrs"))   # LRS family fuses too
    # context'd flow -> not fusable
    # context'd flows fuse since round 3 (test_conditional_flow_fuses...)
    assert can_fuse_nsf(_flow(context_features=3))
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    assert not can_fuse_nsf(MaskedAutoregressiveFlow(
        features=4, hidden_features=16, num_layers=2,
        num_blocks_per_layer=1, key=jax.random.key(0)))


def test_errors(fused):
    with pytest.raises(ValueError):
        fused.forward(jnp.ones((4, 5)))          # wrong feature count
    with pytest.raises(ValueError):
        fused.forward(jnp.ones((4, 6)), context=jnp.ones((4, 1)))
    with pytest.raises(ValueError):
        fused.sample(jax.random.key(0), 8, context=jnp.ones((2, 1)))


def test_model_fused_method(flow):
    fused = flow.fused(dtype=jnp.float32, lanes=128, interpret=True)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(16, 6)),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(flow.log_prob(x)),
                               np.asarray(fused.log_prob(x)), atol=1e-4)


def test_lrs_flow_fuses_and_matches_xla():
    """The beyond-reference linear-rational family runs in the megakernel
    too (kernel spline='lrs' branch)."""
    flow = _flow(spline="lrs")
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    x = jnp.asarray(np.random.default_rng(11).normal(size=(100, 6)) * 2,
                    dtype=jnp.float32)
    y_ref, lad_ref = flow.transform.forward(x)
    y_f, lad_f = fused.forward(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_ref), np.asarray(lad_f),
                               atol=1e-4)
    z = jnp.asarray(np.random.default_rng(12).normal(size=(100, 6)),
                    dtype=jnp.float32)
    x_ref, _ = flow.transform.inverse(z)
    x_f, _ = fused.inverse(z)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_f), atol=1e-5)


def test_conditional_flow_fuses_and_matches_xla():
    """Round-3 VERDICT item 3: conditional NSF flows fuse — the embedded
    context rides the lanes, each block's context GLU is one stationary
    GEMM. Numerics and the sampling key stream must match the XLA chain
    exactly (fp32 interpret mode)."""
    flow = _flow(features=6, hidden=24, layers=3, bins=4,
                 context_features=3)
    assert can_fuse_nsf(flow)
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    assert fused.context_features == 3

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(40, 6)), dtype=jnp.float32)
    c = jnp.asarray(rng.normal(size=(40, 3)), dtype=jnp.float32)

    lp_ref = flow.log_prob(x, c)
    lp_f = fused.log_prob(x, c)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_ref),
                               atol=1e-4)

    y_ref, lad_ref = flow.transform.forward(x, c)
    y_f, lad_f = fused.forward(x, c)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_f), np.asarray(lad_ref),
                               atol=1e-4)

    # conditional sampling: same key stream as Flow._sample -> exact match
    ctx_small = c[:5]
    s_ref = flow.sample(jax.random.key(3), 4, context=ctx_small)
    s_f = fused.sample(jax.random.key(3), 4, context=ctx_small)
    assert s_f.shape == (5, 4, 6)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref), atol=1e-4)

    s_ref2, lp_ref2 = flow.sample_and_log_prob(jax.random.key(4), 4,
                                               context=ctx_small)
    s_f2, lp_f2 = fused.sample_and_log_prob(jax.random.key(4), 4,
                                            context=ctx_small)
    np.testing.assert_allclose(np.asarray(s_f2), np.asarray(s_ref2),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp_f2), np.asarray(lp_ref2),
                               atol=1e-4)

    # context requiredness is enforced both ways
    with pytest.raises(ValueError):
        fused.log_prob(x)
    with pytest.raises(ValueError):
        fuse_nsf(_flow(), dtype=jnp.float32, interpret=True).log_prob(x, c)


def test_conditional_flow_with_embedding_net():
    """The embedding net runs once OUTSIDE the kernel (plain XLA); the
    kernel consumes the embedded context."""
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.nn.primitives import Dense

    inner = _flow(features=4, hidden=16, layers=2, bins=4,
                  context_features=8)
    embed = Dense(2, 8, key=jax.random.key(7))
    flow = Flow(transform=inner.transform, distribution=inner.distribution,
                embedding_net=embed)
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=128, interpret=True)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32)
    c = jnp.asarray(rng.normal(size=(16, 2)), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fused.log_prob(x, c)),
                               np.asarray(flow.log_prob(x, c)), atol=1e-4)
