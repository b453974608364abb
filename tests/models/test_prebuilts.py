"""Prebuilt model tests: NSF, Glow, IAF."""

import jax
import jax.numpy as jnp
import numpy as np

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.models.glow import GlowFlow
from nflows_tpu.models.iaf import InverseAutoregressiveFlow

BATCH = 8


def test_nsf_log_prob_and_sample():
    flow = NeuralSplineFlow(features=6, hidden_features=32, num_layers=3,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0), rng=np.random.default_rng(0))
    x = jax.random.normal(jax.random.key(1), (BATCH, 6))
    lp = flow.log_prob(x)
    assert lp.shape == (BATCH,) and not bool(jnp.any(jnp.isnan(lp)))
    s, slp = flow.sample_and_log_prob(jax.random.key(2), 16)
    assert s.shape == (16, 6)
    np.testing.assert_allclose(np.asarray(slp), np.asarray(flow.log_prob(s)),
                               atol=1e-3)


def test_glow_image_flow():
    shape = (3, 8, 8)
    flow = GlowFlow(shape, num_levels=2, steps_per_level=2,
                    hidden_channels=16, key=jax.random.key(0),
                    rng=np.random.default_rng(0))
    x = jax.random.normal(jax.random.key(1), (BATCH, *shape))
    flow = flow.initialize_actnorms(x)
    lp = flow.log_prob(x)
    assert lp.shape == (BATCH,)
    assert not bool(jnp.any(jnp.isnan(lp)))
    # noise roundtrip through the multiscale transform
    noise, lad = flow.transform.forward(x)
    assert noise.shape == (BATCH, 3 * 8 * 8)
    x_rec, lad_inv = flow.transform.inverse(noise)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-2)


def test_glow_rq_coupling_variant():
    shape = (4, 4, 4)
    flow = GlowFlow(shape, num_levels=1, steps_per_level=2, hidden_channels=8,
                    coupling="rq", num_bins=4, key=jax.random.key(0),
                    rng=np.random.default_rng(0))
    x = jax.random.normal(jax.random.key(1), (BATCH, *shape))
    flow = flow.initialize_actnorms(x)
    lp = flow.log_prob(x)
    assert not bool(jnp.any(jnp.isnan(lp)))


def test_iaf_fast_sampling():
    flow = InverseAutoregressiveFlow(features=5, hidden_features=16,
                                     num_layers=3, num_blocks_per_layer=1,
                                     key=jax.random.key(0))
    # sampling goes through the AR *forward* pass (single MADE call)
    s = flow.sample(jax.random.key(1), 32)
    assert s.shape == (32, 5)
    lp = flow.log_prob(s)
    assert lp.shape == (32,) and not bool(jnp.any(jnp.isnan(lp)))
    s2, lp2 = flow.sample_and_log_prob(jax.random.key(2), 32)
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(flow.log_prob(s2)),
                               atol=1e-3)


def test_glow_stacked_and_nhwc_layout():
    """Round-3 item 10 (CPU-checkable half): the scan-stacked per-level
    step chain matches the unrolled Glow exactly, and the NHWC-internal
    conv layout changes nothing numerically."""
    import numpy as np
    from nflows_tpu import config
    from nflows_tpu.models.glow import GlowFlow

    kw = dict(image_shape=(3, 8, 8), num_levels=2, steps_per_level=3,
              hidden_channels=16, coupling="rq", num_bins=4,
              key=jax.random.key(0))
    unrolled = GlowFlow(rng=np.random.default_rng(0), **kw)
    stacked = GlowFlow(rng=np.random.default_rng(0), stacked=True, **kw)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3, 8, 8)),
                    dtype=jnp.float32)
    unrolled = unrolled.initialize_actnorms(x)
    stacked = stacked.initialize_actnorms(x)

    lp_u = unrolled.log_prob(x)
    lp_s = stacked.log_prob(x)
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_u),
                               rtol=2e-5)
    s_u = unrolled.sample(jax.random.key(2), 3)
    s_s = stacked.sample(jax.random.key(2), 3)
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_u), atol=1e-4)

    config.conv_layout("nhwc")
    try:
        lp_nhwc = stacked.log_prob(x)
    finally:
        config.conv_layout("nchw")
    np.testing.assert_allclose(np.asarray(lp_nhwc), np.asarray(lp_s),
                               atol=1e-4)
