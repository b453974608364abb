"""Pallas quadratic-spline kernel vs the XLA reference implementation.

On CPU the kernel runs in interpret mode — numerics only; the perf path is
exercised on real TPU by benchmarks/bench_pallas_rq.py-style runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.ops import splines
from nflows_tpu.ops.pallas.quadratic_spline import quadratic_spline_pallas

B, D, K = 64, 6, 8


def _params(seed=0):
    keys = jax.random.split(jax.random.key(seed), 3)
    x = 2.5 * jax.random.normal(keys[0], (B, D))  # includes tails
    w = jax.random.normal(keys[1], (B, D, K))
    h = jax.random.normal(keys[2], (B, D, K - 1))
    return x, w, h


@pytest.mark.parametrize("inverse", [False, True])
def test_matches_reference(inverse):
    x, w, h = _params()
    ref_out, ref_lad = splines.unconstrained_quadratic_spline(
        x, w, h, inverse=inverse, tails="linear", tail_bound=3.0
    )
    pl_out, pl_lad = quadratic_spline_pallas(
        x, w, h, inverse=inverse, tail_bound=3.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(pl_out), np.asarray(ref_out),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pl_lad), np.asarray(ref_lad),
                               atol=2e-4)


def test_roundtrip():
    x, w, h = _params(1)
    y, lad = quadratic_spline_pallas(x, w, h, tail_bound=3.0, interpret=True)
    x_rec, lad_inv = quadratic_spline_pallas(
        y, w, h, inverse=True, tail_bound=3.0, interpret=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-4)


def test_gradients_match_reference():
    x, w, h = _params(2)

    def loss_pl(x, w, h):
        out, lad = quadratic_spline_pallas(x, w, h, tail_bound=3.0,
                                           interpret=True)
        return jnp.sum(out ** 2) + jnp.sum(lad)

    def loss_ref(x, w, h):
        out, lad = splines.unconstrained_quadratic_spline(
            x, w, h, tails="linear", tail_bound=3.0)
        return jnp.sum(out ** 2) + jnp.sum(lad)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w, h)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, h)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dispatch_via_config(monkeypatch):
    """set_pallas_splines routes the unconstrained quadratic spline through
    the fused kernel (sentinel check; kernel numerics covered above)."""
    from nflows_tpu import config
    import nflows_tpu.ops.pallas.quadratic_spline as qk
    import nflows_tpu.ops.pallas.rq_spline as rqk

    hits = []
    real = qk.quadratic_spline_pallas

    def recorder(*args, **kw):
        hits.append(1)
        kw["interpret"] = True  # CPU-safe
        return real(*args, **kw)

    monkeypatch.setattr(qk, "quadratic_spline_pallas", recorder)
    monkeypatch.setattr(rqk, "pallas_available", lambda: True)
    x, w, h = _params(3)
    config.set_pallas_splines(True)
    try:
        out, lad = splines.unconstrained_quadratic_spline(
            x, w, h, tails="linear", tail_bound=3.0)
    finally:
        config.set_pallas_splines(False)
    assert hits, "pallas dispatch was not taken"
    ref = splines.unconstrained_quadratic_spline(x, w, h, tails="linear",
                                                 tail_bound=3.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               atol=2e-5)


def test_gradients_terminate_with_dispatch_enabled(monkeypatch):
    """Regression: with set_pallas_splines(True), each kernel's custom_vjp
    backward differentiates the XLA reference — which must NOT re-dispatch
    to the kernel (the recursion had no base case). The suspension guard in
    config makes one grad call dispatch the kernel exactly once."""
    from nflows_tpu import config
    import nflows_tpu.ops.pallas.quadratic_spline as qk
    import nflows_tpu.ops.pallas.rq_spline as rqk

    hits = []
    real = qk.quadratic_spline_pallas

    def recorder(*args, **kw):
        hits.append(1)
        assert len(hits) <= 2, "pallas dispatch re-entered from its own vjp"
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(qk, "quadratic_spline_pallas", recorder)
    monkeypatch.setattr(rqk, "pallas_available", lambda: True)
    x, w, h = _params(4)
    config.set_pallas_splines(True)
    try:
        def loss(w):
            out, lad = splines.unconstrained_quadratic_spline(
                x, w, h, tails="linear", tail_bound=3.0)
            return jnp.sum(out) + jnp.sum(lad)

        g = jax.grad(loss)(w)
    finally:
        config.set_pallas_splines(False)
    assert hits and len(hits) <= 2, hits
    # gradient equals the plain XLA gradient
    def loss_ref(w):
        out, lad = splines.unconstrained_quadratic_spline(
            x, w, h, tails="linear", tail_bound=3.0)
        return jnp.sum(out) + jnp.sum(lad)
    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)
