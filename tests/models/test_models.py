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


def test_nsf_ar_with_lu_linear_layers():
    """BASELINE config 4: masked AR spline flow with LU-linear layers."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nflows_tpu.models import NeuralSplineFlowAR
    from nflows_tpu.transforms import LULinear

    flow = NeuralSplineFlowAR(features=4, hidden_features=16, num_layers=2,
                              num_blocks_per_layer=1, num_bins=4,
                              use_linear_layers=True, key=jax.random.key(0))
    kinds = [type(t).__name__ for t in flow.transform.transforms]
    assert "LULinear" in kinds
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)),
                    dtype=jnp.float32)
    lp = flow.log_prob(x)
    assert bool(jnp.all(jnp.isfinite(lp)))
    s, slp = flow.sample_and_log_prob(jax.random.key(1), 32)
    np.testing.assert_allclose(np.asarray(slp),
                               np.asarray(flow.log_prob(s)), atol=5e-3)


def test_conditional_nsf():
    """BASELINE config 5: conditional spline flow (amortized posterior)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import create_train_state, make_train_step

    flow = NeuralSplineFlow(features=2, hidden_features=24, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            context_features=3, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 2)), dtype=jnp.float32)
    c = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
    lp = flow.log_prob(x, context=c)
    assert lp.shape == (64,) and bool(jnp.all(jnp.isfinite(lp)))
    # sampling broadcasts to [context_size, n, D]
    s = flow.sample(jax.random.key(1), 8, context=c[:5])
    assert s.shape == (5, 8, 2)
    # the conditional density actually depends on the context
    lp2 = flow.log_prob(x, context=c + 1.0)
    assert not np.allclose(np.asarray(lp), np.asarray(lp2))
    # trains
    opt = optax.adam(1e-3)
    state = create_train_state(flow, opt)
    step = make_train_step(opt, donate=False)
    state, m = step(state, x, c)
    assert np.isfinite(float(m["loss"]))
