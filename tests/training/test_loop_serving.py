"""run_training resume + CompiledFlow serving tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.data import NumpyDataLoader
from nflows_tpu.flows import MaskedAutoregressiveFlow
from nflows_tpu.serving import CompiledFlow
from nflows_tpu.training import create_train_state, make_train_step
from nflows_tpu.training.loop import run_training
from nflows_tpu.utils.datasets import make_moons


def _setup():
    flow = MaskedAutoregressiveFlow(features=2, hidden_features=8, num_layers=2,
                                    num_blocks_per_layer=1, key=jax.random.key(0))
    opt = optax.adam(1e-3)
    return flow, opt


def test_run_training_and_resume(tmp_path):
    X, _ = make_moons(512, noise=0.1, rng=np.random.default_rng(0))
    flow, opt = _setup()
    state = create_train_state(flow, opt)
    step = make_train_step(opt, donate=False)
    ckdir = str(tmp_path / "run")

    loader = NumpyDataLoader(X, batch_size=64, seed=0)
    state = run_training(state, step, loader,
                         num_steps=20, checkpoint_dir=ckdir,
                         checkpoint_every=10, log_every=10,
                         prepare_batch=jnp.asarray)
    assert int(state.step) == 20

    # simulate a restart: fresh state, same dir -> resumes from step 20
    fresh = create_train_state(*_setup())
    resumed = run_training(fresh, step, NumpyDataLoader(X, 64, seed=1),
                           num_steps=30, checkpoint_dir=ckdir,
                           checkpoint_every=10, log_every=10,
                           prepare_batch=jnp.asarray)
    assert int(resumed.step) == 30


def test_compiled_flow_serving():
    flow, _ = _setup()
    served = CompiledFlow(flow, batch_size=16, features=2, num_samples=32)

    x = jax.random.normal(jax.random.key(1), (16, 2))
    lp = served.log_prob(x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(flow.log_prob(x)),
                               atol=1e-5)

    s = served.sample(jax.random.key(2))
    assert s.shape == (32, 2)
    s2, lp2 = served.sample_and_log_prob(jax.random.key(3))
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(flow.log_prob(s2)),
                               atol=1e-3)

    with pytest.raises(ValueError):
        served.log_prob(jnp.ones((8, 2)))  # shape drift rejected


def test_compiled_flow_conditional():
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows import Flow
    from nflows_tpu.transforms import MaskedAffineAutoregressiveTransform

    t = MaskedAffineAutoregressiveTransform(2, 8, context_features=3,
                                            key=jax.random.key(0))
    flow = Flow(t, StandardNormal([2]))
    served = CompiledFlow(flow, batch_size=16, features=2, num_samples=4,
                          context_features=3)
    x = jax.random.normal(jax.random.key(1), (16, 2))
    c = jax.random.normal(jax.random.key(2), (16, 3))
    lp = served.log_prob(x, c)
    assert lp.shape == (16,)
    s = served.sample(jax.random.key(3), c)
    assert s.shape == (16, 4, 2)


def test_compiled_flow_context_validation():
    """Regression: a passed context was silently dropped when the wrapper
    was built without context_features."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from nflows_tpu.flows import SimpleRealNVP
    from nflows_tpu.serving import CompiledFlow

    flow = SimpleRealNVP(features=2, hidden_features=8, num_layers=1,
                         num_blocks_per_layer=1, key=jax.random.key(0))
    served = CompiledFlow(flow, batch_size=4, features=2)
    x = jnp.zeros((4, 2))
    with pytest.raises(ValueError, match="silently ignored"):
        served.log_prob(x, context=jnp.zeros((4, 1)))
    # legacy PRNGKey accepted via conversion
    s = served.sample(jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(s)))
    with pytest.raises(TypeError, match="PRNG key"):
        served.sample(np.zeros(3))


def test_compiled_flow_fused_path_matches_xla():
    """Serving defaults to the whole-flow megakernel when the flow
    qualifies; numerics must match the XLA endpoints (fp32 here)."""
    import numpy as np
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.serving import CompiledFlow

    flow = NeuralSplineFlow(features=6, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    xla = CompiledFlow(flow, batch_size=32, features=6, use_fused=False)
    # CompiledFlow's dtype (fp32 default) governs the fused GEMM precision
    fused = CompiledFlow(flow, batch_size=32, features=6, use_fused=True)
    assert fused._fused is not None
    assert fused._fused._weights["wb"].dtype == jnp.float32
    # lane tile sized to the request, not a fixed 2048
    assert fused._fused._lanes == 128

    x = jnp.asarray(np.random.default_rng(1).normal(size=(32, 6)),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(xla.log_prob(x)),
                               np.asarray(fused.log_prob(x)), atol=1e-4)
    s_x = xla.sample(jax.random.key(2))
    s_f = fused.sample(jax.random.key(2))
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_f), atol=1e-4)

    # a non-qualifying flow (context'd) must fall back, not crash
    import pytest
    with pytest.raises(ValueError):
        CompiledFlow(flow, batch_size=8, features=6, context_features=2,
                     use_fused=True)


def test_compiled_flow_fused_maf_and_fallbacks():
    import numpy as np
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.serving import CompiledFlow

    maf = MaskedAutoregressiveFlow(features=4, hidden_features=16,
                                   num_layers=2, num_blocks_per_layer=1,
                                   key=jax.random.key(0))
    served = CompiledFlow(maf, batch_size=16, features=4, use_fused=True)
    assert served._fused is not None
    x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 4)),
                    dtype=jnp.float32)
    lp_xla = CompiledFlow(maf, batch_size=16, features=4,
                          use_fused=False).log_prob(x)
    np.testing.assert_allclose(np.asarray(lp_xla),
                               np.asarray(served.log_prob(x)), atol=1e-4)

    # non-qualifying flow (tanh conditioner — the fused ResidualNet is
    # relu-only): auto mode must fall back silently, explicit
    # use_fused=True must raise a clear error. (SimpleRealNVP itself
    # fuses since round 3 — tests/ops/test_realnvp_fused.py.)
    import pytest
    from nflows_tpu.flows import SimpleRealNVP
    nvp = SimpleRealNVP(features=4, hidden_features=16, num_layers=2,
                        num_blocks_per_layer=1, key=jax.random.key(1),
                        activation=jnp.tanh)
    assert CompiledFlow(nvp, batch_size=8, features=4)._fused is None
    with pytest.raises(ValueError):
        CompiledFlow(nvp, batch_size=8, features=4, use_fused=True)


def test_compiled_flow_fused_vmem_budget_guard(monkeypatch):
    """Auto mode silently falls back to XLA endpoints when the stacked
    weights exceed the kernel's VMEM budget; explicit use_fused=True
    raises a clear error instead of failing at request time."""
    import numpy as np
    import pytest
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.serving import CompiledFlow
    import nflows_tpu.ops.pallas.rq_spline as rqk

    flow = NeuralSplineFlow(features=6, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    monkeypatch.setattr(CompiledFlow, "_FUSED_VMEM_BUDGET", 1024)
    monkeypatch.setattr(rqk, "pallas_available", lambda: True)
    served = CompiledFlow(flow, batch_size=8, features=6)
    assert served._fused is None  # silent fallback
    x = jnp.ones((8, 6))
    assert served.log_prob(x).shape == (8,)  # XLA endpoint still works
    with pytest.raises(ValueError):
        CompiledFlow(flow, batch_size=8, features=6, use_fused=True)


def test_compiled_flow_is_fused_and_per_endpoint_lanes(caplog, monkeypatch):
    """ADVICE round-2 items: public `is_fused`, a one-time info log on
    auto-selection, and per-endpoint lane sizing (a small-batch log_prob
    endpoint must not pad up to a large num_samples tile)."""
    import logging

    import numpy as np
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.ops.pallas import rq_spline
    from nflows_tpu.serving import CompiledFlow

    # auto mode only engages where a TPU is present; force the kernels into
    # interpret mode so they still run on this CPU host
    import functools

    from nflows_tpu.ops.pallas import nsf_fused

    monkeypatch.setattr(rq_spline, "pallas_available", lambda: True)
    monkeypatch.setattr(nsf_fused, "fuse_nsf",
                        functools.partial(nsf_fused.fuse_nsf, interpret=True))

    flow = NeuralSplineFlow(features=6, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    with caplog.at_level(logging.INFO, logger="nflows_tpu.serving"):
        served = CompiledFlow(flow, batch_size=32, features=6,
                              num_samples=4096)
    assert served.is_fused
    assert any("auto-selected" in r.message for r in caplog.records)
    assert not CompiledFlow(flow, batch_size=32, features=6,
                            use_fused=False).is_fused
    # log_prob view tiles to the batch, sampling view to num_samples
    assert served._fused._lanes == 128
    assert served._fused_sampling._lanes == 2048
    # the two views share the extracted weights (no second host transfer)
    assert served._fused_sampling._weights is served._fused._weights

    x = jnp.asarray(np.random.default_rng(1).normal(size=(32, 6)),
                    dtype=jnp.float32)
    lp = served.log_prob(x)
    assert lp.shape == (32,)
    s = served.sample(jax.random.key(2))
    assert s.shape == (4096, 6)
    # explicit use_fused=True must not log the auto-selection notice
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="nflows_tpu.serving"):
        CompiledFlow(flow, batch_size=32, features=6, use_fused=True)
    assert not any("auto-selected" in r.message for r in caplog.records)


def test_compiled_flow_conditional_fused(monkeypatch):
    """Round-3 VERDICT item 3: a conditional CompiledFlow auto-selects the
    fused NSF path (the round-2 hard rejection is gone) and matches the
    XLA endpoints."""
    import functools

    import numpy as np
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.ops.pallas import nsf_fused, rq_spline
    from nflows_tpu.serving import CompiledFlow

    monkeypatch.setattr(rq_spline, "pallas_available", lambda: True)
    monkeypatch.setattr(nsf_fused, "fuse_nsf",
                        functools.partial(nsf_fused.fuse_nsf, interpret=True))

    flow = NeuralSplineFlow(features=4, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            context_features=2, key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    served = CompiledFlow(flow, batch_size=16, features=4,
                          context_features=2, num_samples=8)
    assert served.is_fused

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32)
    c = jnp.asarray(rng.normal(size=(16, 2)), dtype=jnp.float32)
    xla = CompiledFlow(flow, batch_size=16, features=4, context_features=2,
                       num_samples=8, use_fused=False)
    np.testing.assert_allclose(np.asarray(served.log_prob(x, c)),
                               np.asarray(xla.log_prob(x, c)), atol=1e-4)
    s_f = served.sample(jax.random.key(2), context=c)
    s_x = xla.sample(jax.random.key(2), context=c)
    assert s_f.shape == (16, 8, 4)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x), atol=1e-4)


def test_compiled_flow_conditional_fused_maf(monkeypatch):
    """A conditional MAF also auto-selects its megakernel in serving
    (round 3: the AR kernel's additive context projections)."""
    import functools

    import numpy as np
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.ops.pallas import maf_fused, rq_spline
    from nflows_tpu.serving import CompiledFlow
    from nflows_tpu.transforms import (
        CompositeTransform,
        MaskedAffineAutoregressiveTransform,
        RandomPermutation,
    )

    monkeypatch.setattr(rq_spline, "pallas_available", lambda: True)
    monkeypatch.setattr(maf_fused, "fuse_maf",
                        functools.partial(maf_fused.fuse_maf,
                                          interpret=True))

    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.key(0), 2)
    chain = []
    for i in range(2):
        chain.append(RandomPermutation(4, rng=rng))
        chain.append(MaskedAffineAutoregressiveTransform(
            features=4, hidden_features=16, context_features=2,
            num_blocks=1, key=keys[i]))
    flow = Flow(transform=CompositeTransform(chain),
                distribution=StandardNormal([4]))

    served = CompiledFlow(flow, batch_size=16, features=4,
                          context_features=2, num_samples=8)
    assert served.is_fused

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32)
    c = jnp.asarray(rng.normal(size=(16, 2)), dtype=jnp.float32)
    xla = CompiledFlow(flow, batch_size=16, features=4, context_features=2,
                       num_samples=8, use_fused=False)
    np.testing.assert_allclose(np.asarray(served.log_prob(x, c)),
                               np.asarray(xla.log_prob(x, c)), atol=1e-4)
    s_f = served.sample(jax.random.key(2), context=c)
    s_x = xla.sample(jax.random.key(2), context=c)
    assert s_f.shape == (16, 8, 4)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x), atol=1e-4)


def test_compiled_flow_serves_mademog_distribution():
    """CompiledFlow accepts a bare mixture-density Distribution: log_prob
    auto-routes to the MADEMoG megakernel (use_fused=True), sampling stays
    on the AOT XLA endpoints (the kernel has no fused sampler)."""
    from nflows_tpu.distributions import MADEMoG

    made = MADEMoG(
        features=3, hidden_features=16, num_blocks=2,
        num_mixture_components=3, context_features=None,
        key=jax.random.key(11), rng=np.random.default_rng(11))
    x = jnp.asarray(np.random.default_rng(12).normal(size=(16, 3)),
                    jnp.float32)

    fused = CompiledFlow(made, batch_size=16, features=3, num_samples=8,
                         use_fused=True)
    assert fused.is_fused and fused._fused_sampling is None
    xla = CompiledFlow(made, batch_size=16, features=3, num_samples=8,
                       use_fused=False)
    np.testing.assert_allclose(np.asarray(fused.log_prob(x)),
                               np.asarray(xla.log_prob(x)), atol=1e-5)
    s = fused.sample(jax.random.key(13))
    assert s.shape == (8, 3)
    s2, lp2 = fused.sample_and_log_prob(jax.random.key(13))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), atol=1e-6)
    assert lp2.shape == (8,)
