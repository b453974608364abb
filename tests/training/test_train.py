"""End-to-end training tests: the two-moons convergence anchor
(reference examples/moons.ipynb) in miniature, plus train-step mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nflows_tpu.flows.autoregressive import MaskedAutoregressiveFlow
from nflows_tpu.flows.realnvp import SimpleRealNVP
from nflows_tpu.training import create_train_state, make_train_step
from nflows_tpu.utils.datasets import make_moons


def test_train_step_decreases_loss():
    flow = MaskedAutoregressiveFlow(features=2, hidden_features=16, num_layers=2,
                                    num_blocks_per_layer=1, key=jax.random.key(0))
    optimizer = optax.adam(1e-3)
    state = create_train_state(flow, optimizer)
    step = make_train_step(optimizer, donate=False)

    rng = np.random.default_rng(0)
    X, _ = make_moons(512, noise=0.1, rng=rng)
    batch = jnp.asarray(X[:128])

    _, m0 = step(state, batch)
    s = state
    for _ in range(50):
        s, m = step(s, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(s.step) == 50


def test_moons_convergence_maf():
    """Small-scale version of the reference convergence anchor: MAF on moons
    must beat a fitted standard normal's NLL within a few hundred steps."""
    rng = np.random.default_rng(42)
    X, _ = make_moons(2048, noise=0.1, rng=rng)
    X = (X - X.mean(0)) / X.std(0)
    data = jnp.asarray(X)

    flow = MaskedAutoregressiveFlow(features=2, hidden_features=32, num_layers=4,
                                    num_blocks_per_layer=2, key=jax.random.key(7))
    optimizer = optax.adam(3e-3)
    state = create_train_state(flow, optimizer)
    step = make_train_step(optimizer)

    key = jax.random.key(0)
    for i in range(400):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (128,), 0, data.shape[0])
        state, metrics = step(state, data[idx])

    final_nll = float(metrics["loss"])
    # NLL of a standard normal on standardized data ~= 0.5*D*(1+log 2π) ≈ 2.84;
    # a converged moons flow should be clearly below it.
    assert final_nll < 2.4, f"final NLL {final_nll} did not beat gaussian baseline"
    # samples stay finite and roughly in range
    samples = state.flow.sample(jax.random.key(1), 256)
    assert not bool(jnp.any(jnp.isnan(samples)))
    assert float(jnp.abs(samples).max()) < 50.0


def test_realnvp_trains():
    rng = np.random.default_rng(3)
    X, _ = make_moons(1024, noise=0.1, rng=rng)
    X = (X - X.mean(0)) / X.std(0)
    data = jnp.asarray(X)

    flow = SimpleRealNVP(features=2, hidden_features=32, num_layers=4,
                         num_blocks_per_layer=2, key=jax.random.key(0))
    optimizer = optax.adam(3e-3)
    state = create_train_state(flow, optimizer)
    step = make_train_step(optimizer)

    key = jax.random.key(0)
    m0 = None
    for i in range(200):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (128,), 0, data.shape[0])
        state, metrics = step(state, data[idx])
        if m0 is None:
            m0 = float(metrics["loss"])
    assert float(metrics["loss"]) < m0


def test_scan_train_step_dropout_key():
    """Regression: scan loop previously had no dropout-key path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    flow = MaskedAutoregressiveFlow(features=2, hidden_features=16,
                                    num_layers=1, num_blocks_per_layer=1,
                                    dropout_probability=0.5,
                                    key=jax.random.key(0))
    opt = optax.adam(1e-3)
    steps = make_scan_train_step(opt, donate=False)
    W = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 2)),
                    dtype=jnp.float32)

    state = create_train_state(flow, opt)
    _, losses_nokey = steps(state, W)
    state = create_train_state(flow, opt)
    _, losses_key = steps(state, W, jax.random.key(1))
    assert np.all(np.isfinite(np.asarray(losses_key)))
    # dropout active -> different losses than the eval-mode path
    assert not np.allclose(np.asarray(losses_nokey), np.asarray(losses_key))


def test_scan_train_step_remat_matches():
    """remat=True recomputes instead of storing residuals; numerics are
    identical to the plain scan step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nflows_tpu.flows import SimpleRealNVP
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1, key=jax.random.key(0))
    opt = optax.adam(1e-3)
    W = jnp.asarray(np.random.default_rng(0).normal(size=(3, 64, 2)),
                    dtype=jnp.float32)

    state = create_train_state(flow, opt)
    _, losses_plain = make_scan_train_step(opt, donate=False)(state, W)
    state = create_train_state(flow, opt)
    _, losses_remat = make_scan_train_step(
        opt, donate=False, remat=True)(state, W)
    np.testing.assert_allclose(np.asarray(losses_plain),
                               np.asarray(losses_remat), rtol=1e-6)
