"""Prebuilt model-family tests (NSF-AR; coupling-NSF/Glow/IAF live in test_prebuilts.py)."""


class TestNeuralSplineFlowAR:
    def test_log_prob_train_and_sample(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from nflows_tpu.models import NeuralSplineFlowAR
        from nflows_tpu.training import create_train_state, make_train_step

        flow = NeuralSplineFlowAR(
            features=3, hidden_features=16, num_layers=2,
            num_blocks_per_layer=1, num_bins=4, tail_bound=2.0,
            key=jax.random.key(0), rng=np.random.default_rng(0),
        )
        x = jnp.asarray(np.random.default_rng(1).normal(size=(32, 3)),
                        dtype=jnp.float32)
        lp = flow.log_prob(x)
        assert lp.shape == (32,) and bool(jnp.all(jnp.isfinite(lp)))

        # sampling (sequential AR inverse) round-trips through log_prob
        s, slp = flow.sample_and_log_prob(jax.random.key(1), 64)
        assert s.shape == (64, 3)
        np.testing.assert_allclose(
            np.asarray(slp), np.asarray(flow.log_prob(s)), atol=5e-3)

        # one train step runs and is finite
        opt = optax.adam(1e-3)
        state = create_train_state(flow, opt)
        step = make_train_step(opt, donate=False)
        state, m = step(state, x)
        assert np.isfinite(float(m["loss"]))


def test_nsf_lrs_variant():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nflows_tpu.models import NeuralSplineFlow

    flow = NeuralSplineFlow(features=3, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            spline="lrs", key=jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)),
                    dtype=jnp.float32)
    lp = flow.log_prob(x)
    assert lp.shape == (16,) and bool(jnp.all(jnp.isfinite(lp)))
    s, slp = flow.sample_and_log_prob(jax.random.key(1), 32)
    np.testing.assert_allclose(np.asarray(slp),
                               np.asarray(flow.log_prob(s)), atol=5e-3)
