"""Ambient stochastic (dropout) context tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nflows_tpu.core.stochastic import has_stochastic_context, stochastic
from nflows_tpu.nn.nets import ResidualNet
from nflows_tpu.nn.primitives import Dropout


def test_dropout_inactive_without_context():
    d = Dropout(0.5)
    x = jnp.ones((4, 8))
    np.testing.assert_array_equal(np.asarray(d(x)), np.asarray(x))
    assert not has_stochastic_context()


def test_dropout_active_in_context():
    d = Dropout(0.5)
    x = jnp.ones((64, 64))
    with stochastic(jax.random.key(0)):
        y = d(x)
    arr = np.asarray(y)
    assert (arr == 0).mean() > 0.3  # roughly half dropped
    assert np.allclose(arr[arr != 0], 2.0)  # inverted scaling


def test_distinct_keys_per_site():
    d = Dropout(0.5)
    x = jnp.ones((64, 64))
    with stochastic(jax.random.key(0)):
        y1 = d(x)
        y2 = d(x)
    assert not np.array_equal(np.asarray(y1), np.asarray(y2))


def test_dropout_under_jit_varies_with_key():
    net = ResidualNet(4, 4, hidden_features=32, num_blocks=2,
                      dropout_probability=0.5, key=jax.random.key(0))
    x = jnp.ones((8, 4))

    @jax.jit
    def f(net, x, key):
        with stochastic(key):
            return net(x)

    y1 = f(net, x, jax.random.key(1))
    y2 = f(net, x, jax.random.key(2))
    y_eval = net(x)
    assert not np.array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.array_equal(np.asarray(y1), np.asarray(y_eval))
    # same key -> deterministic
    y1b = f(net, x, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))


def test_train_step_with_dropout_key():
    from nflows_tpu.flows import SimpleRealNVP
    from nflows_tpu.training import create_train_state, make_train_step

    flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1, dropout_probability=0.3,
                         key=jax.random.key(0))
    opt = optax.adam(1e-3)
    state = create_train_state(flow, opt)
    step = make_train_step(opt, donate=False)
    x = jax.random.normal(jax.random.key(1), (64, 2))
    s1, m1 = step(state, x, None, jax.random.key(10))
    s2, m2 = step(state, x, None, jax.random.key(11))
    # different dropout masks -> different losses from the same state
    assert float(m1["loss"]) != float(m2["loss"])
    # eval path (no key) still works
    s3, m3 = step(state, x)
    assert np.isfinite(float(m3["loss"]))


def test_stochastic_outside_jit_with_trace_inside_raises():
    """Regression: entering stochastic(key) outside the jitted function
    would bake the concrete key into the compiled program as a constant."""
    import jax
    import jax.numpy as jnp
    import pytest

    from nflows_tpu.core.stochastic import next_rng_key, stochastic

    @jax.jit
    def traced(x):
        k = next_rng_key()
        return x if k is None else x + jax.random.normal(k, x.shape)

    with stochastic(jax.random.key(0)):      # concrete key, outside jit
        with pytest.raises(RuntimeError, match="baked into the compiled"):
            traced(jnp.zeros(3))
