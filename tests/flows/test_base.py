"""Flow API contract tests (reference: tests/flows/base_test.py:14-104)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.distributions.normal import ConditionalDiagonalNormal, StandardNormal
from nflows_tpu.flows.base import Flow
from nflows_tpu.flows.autoregressive import MaskedAutoregressiveFlow
from nflows_tpu.flows.realnvp import SimpleRealNVP
from nflows_tpu.nn.primitives import Dense
from nflows_tpu.transforms.autoregressive import MaskedAffineAutoregressiveTransform

BATCH, FEATURES, CONTEXT = 10, 4, 3


def _make_flow(context_features=None):
    transform = MaskedAffineAutoregressiveTransform(
        features=FEATURES, hidden_features=16, context_features=context_features,
        key=jax.random.key(0),
    )
    return Flow(transform, StandardNormal([FEATURES]))


def test_log_prob_shape():
    flow = _make_flow()
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    lp = flow.log_prob(x)
    assert lp.shape == (BATCH,)
    assert not bool(jnp.any(jnp.isnan(lp)))


def test_sample_shape():
    flow = _make_flow()
    samples = flow.sample(jax.random.key(1), 7)
    assert samples.shape == (7, FEATURES)


def test_sample_with_context_shape():
    flow = _make_flow(context_features=CONTEXT)
    context = jax.random.normal(jax.random.key(2), (5, CONTEXT))
    samples = flow.sample(jax.random.key(1), 7, context=context)
    assert samples.shape == (5, 7, FEATURES)


def test_sample_batched():
    flow = _make_flow()
    samples = flow.sample(jax.random.key(1), 10, batch_size=4)
    assert samples.shape == (10, FEATURES)


def test_sample_and_log_prob_consistency():
    """sample_and_log_prob ≡ sample + log_prob (reference base_test.py:54-69)."""
    flow = _make_flow()
    key = jax.random.key(3)
    samples, log_prob = flow.sample_and_log_prob(key, 20)
    assert samples.shape == (20, FEATURES)
    assert log_prob.shape == (20,)
    log_prob_direct = flow.log_prob(samples)
    np.testing.assert_allclose(
        np.asarray(log_prob), np.asarray(log_prob_direct), atol=1e-3
    )


def test_sample_and_log_prob_with_context():
    flow = _make_flow(context_features=CONTEXT)
    context = jax.random.normal(jax.random.key(2), (5, CONTEXT))
    samples, log_prob = flow.sample_and_log_prob(jax.random.key(3), 7, context=context)
    assert samples.shape == (5, 7, FEATURES)
    assert log_prob.shape == (5, 7)


def test_transform_to_noise():
    flow = _make_flow()
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    noise = flow.transform_to_noise(x)
    assert noise.shape == (BATCH, FEATURES)


def test_conditional_base_distribution():
    encoder = Dense(CONTEXT, 2 * FEATURES, key=jax.random.key(0))
    base = ConditionalDiagonalNormal([FEATURES], context_encoder=encoder)
    transform = MaskedAffineAutoregressiveTransform(
        features=FEATURES, hidden_features=16, context_features=CONTEXT,
        key=jax.random.key(1),
    )
    flow = Flow(transform, base)
    x = jax.random.normal(jax.random.key(2), (BATCH, FEATURES))
    c = jax.random.normal(jax.random.key(3), (BATCH, CONTEXT))
    lp = flow.log_prob(x, c)
    assert lp.shape == (BATCH,)
    samples = flow.sample(jax.random.key(4), 6, context=c)
    assert samples.shape == (BATCH, 6, FEATURES)


def test_prebuilt_realnvp():
    flow = SimpleRealNVP(features=FEATURES, hidden_features=16, num_layers=3,
                         num_blocks_per_layer=1, key=jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    lp = flow.log_prob(x)
    assert lp.shape == (BATCH,)
    s = flow.sample(jax.random.key(2), 5)
    assert s.shape == (5, FEATURES)


def test_prebuilt_maf():
    flow = MaskedAutoregressiveFlow(features=FEATURES, hidden_features=16,
                                    num_layers=3, num_blocks_per_layer=1,
                                    key=jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    lp = flow.log_prob(x)
    assert lp.shape == (BATCH,)
    s = flow.sample(jax.random.key(2), 5)
    assert s.shape == (5, FEATURES)


def test_log_prob_jitted_matches_eager():
    flow = _make_flow()
    x = jax.random.normal(jax.random.key(1), (BATCH, FEATURES))
    eager = flow.log_prob(x)
    jitted = jax.jit(lambda f, z: f.log_prob(z))(flow, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)


def test_sample_context_free_base_no_context():
    """Regression: context_used_in_base=False + no context crashed on
    embedded_context.shape (inherited reference bug, flows/base.py:56)."""
    import jax
    import numpy as np

    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.transforms import IdentityTransform

    flow = Flow(IdentityTransform(), StandardNormal([2]),
                context_used_in_base=False)
    s = flow.sample(jax.random.key(0), 8)
    assert s.shape == (8, 2)
    assert np.all(np.isfinite(np.asarray(s)))


def test_sample_and_log_prob_conditional_transform_context_free_base():
    """Regression: conditional transform over a context-free base corrupted
    shapes in sample_and_log_prob (reference flows/base.py:84-91 is broken
    the same way; fixed here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.transforms import MaskedAffineAutoregressiveTransform

    t = MaskedAffineAutoregressiveTransform(
        features=2, hidden_features=16, context_features=3,
        key=jax.random.key(0))
    flow = Flow(t, StandardNormal([2]), context_used_in_base=False)
    assert not flow.context_used_in_base
    ctx = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)),
                      dtype=jnp.float32)
    s, lp = flow.sample_and_log_prob(jax.random.key(1), 4, context=ctx)
    assert s.shape == (5, 4, 2) and lp.shape == (5, 4)
    # consistency with log_prob
    flat = s.reshape(-1, 2)
    rep_ctx = jnp.repeat(ctx, 4, axis=0)
    lp2 = flow.log_prob(flat, context=rep_ctx).reshape(5, 4)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=5e-3)
    # distinct noise per (context, sample)
    assert not np.allclose(np.asarray(s[0]), np.asarray(s[1]))
