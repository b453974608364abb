"""Packed-sublane spline stage (round 3) vs the unpacked round-2 form.

``_rq_spline_TR_packed`` keeps the K-bin axis packed on sublanes
([K*T, R]) and runs every structural move (group broadcast / prefix /
shift / one-hot select) as a tiny ``kron(S, I_T)`` matmul. Both variants
are pure jnp functions, so exact-semantics parity is pinned here on CPU;
the Mosaic-compiled speed comparison lives in
benchmarks/bench_fused_nsf.py --packed on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu import config
from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_flow_kernel import (
    _lrs_spline_TR,
    _lrs_spline_TR_packed,
    _lrs_spline_TR_packed_roll,
    _rq_spline_TR,
    _rq_spline_TR_packed,
    _rq_spline_TR_packed_roll,
)
from nflows_tpu.ops.pallas.nsf_fused import fuse_nsf

T, K, R = 3, 8, 128

KW = dict(num_bins=K, T=T, tail_bound=3.0, min_bin_width=1e-3,
          min_bin_height=1e-3, min_derivative=1e-3)
LRS_KW = dict(KW, min_lambda=0.025)

FAMILIES = {
    "rq": (_rq_spline_TR, _rq_spline_TR_packed, (3 * K - 1) * T, KW),
    "lrs": (_lrs_spline_TR, _lrs_spline_TR_packed, (4 * K - 1) * T, LRS_KW),
    # round-5 roll-based structural moves (custom_vjp pltpu roll/repeat
    # in-kernel, jnp fallbacks in these pure-function tests)
    "rq_roll": (_rq_spline_TR, _rq_spline_TR_packed_roll,
                (3 * K - 1) * T, KW),
    "lrs_roll": (_lrs_spline_TR, _lrs_spline_TR_packed_roll,
                 (4 * K - 1) * T, LRS_KW),
}


def _params(seed, tm, scale=1.0):
    rng = np.random.default_rng(seed)
    P = jnp.asarray(rng.normal(size=(tm, R)) * scale, jnp.float32)
    x = jnp.asarray(rng.normal(size=(T, R)) * 2.0, jnp.float32)
    # include exact boundary / outside values on some lanes
    x = x.at[:, 0].set(-3.0).at[:, 1].set(3.0)
    x = x.at[:, 2].set(-5.0).at[:, 3].set(7.5)
    return x, P


@pytest.mark.parametrize("family", sorted(FAMILIES))
@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("scale", [1.0, 3.0])
def test_packed_matches_unpacked(family, inverse, scale):
    unpacked, packed, tm, kw = FAMILIES[family]
    x, P = _params(0 if not inverse else 1, tm, scale)
    out_u, lad_u = unpacked(x, P, inverse=inverse, **kw)
    out_p, lad_p = packed(x, P, inverse=inverse, **kw)
    # reductions reassociate (tree max / MXU accumulation): ~ulp-level band
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_p),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_u), np.asarray(lad_p),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_packed_round_trip(family):
    _, packed, tm, kw = FAMILIES[family]
    x, P = _params(2, tm)
    y, lad_f = packed(x, P, inverse=False, **kw)
    x_back, lad_i = packed(y, P, inverse=True, **kw)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_back), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad_f + lad_i),
                               np.zeros_like(lad_f), atol=2e-4)


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_packed_every_sample_in_one_bin(family):
    """The matmul one-hot must sum to exactly 1 per element (bit-consistent
    adjacent edges) — the property the packed layout was designed around."""
    _, packed, tm, kw = FAMILIES[family]
    x, P = _params(3, tm)
    # grads through the packed path must also be finite (training uses it)
    def f(P_):
        out, lad = packed(x, P_, inverse=False, **kw)
        return jnp.sum(out) + jnp.sum(lad)

    g = jax.grad(f)(P)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_fused_training_packed_grads_match_xla():
    """Packed-select fused training (forward AND recompute-in-kernel
    backward run the packed spline form): loss + gradients must still
    match the autodiff'd XLA chain to reassociation tolerance."""
    from nflows_tpu.core.module import combine, partition
    from nflows_tpu.ops.pallas.nsf_fused import _extract
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    flow = NeuralSplineFlow(
        features=6, hidden_features=32, num_layers=3,
        num_blocks_per_layer=2, num_bins=4, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(128, 6)) * 1.5,
                    jnp.float32)
    try:
        config.packed_spline_select(True)
        trainer = FusedNSFTrainer(flow, batch_size=128, interpret=True)
        fused_loss = float(trainer.loss_fn(trainer.weights, x.T))
        g_fused = jax.grad(trainer.loss_fn)(trainer.weights, x.T)
    finally:
        config._state["packed_spline_select"] = None

    xla_loss_val = float(-flow.log_prob(x).mean())
    assert abs(fused_loss - xla_loss_val) < 1e-4, (fused_loss, xla_loss_val)

    def xla_loss(params, rest):
        return -combine(params, rest).log_prob(x).mean()

    params, rest = partition(flow)
    g_params = jax.grad(xla_loss)(params, rest)
    _, g_ref, _, _, _ = _extract(combine(g_params, rest), jnp.float32,
                                 fold_wh_scale=False)
    for k in ("w0", "b0", "wb", "bb", "wf", "bf"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_ref[k]),
            atol=5e-4, err_msg=k)


def test_kernel_dispatch_packed_vs_unpacked():
    """End-to-end through the fused kernel (interpret mode): flipping the
    config toggle changes only numerics at the reassociation level."""
    flow = NeuralSplineFlow(
        features=6, hidden_features=32, num_layers=4,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(5).normal(size=(64, 6)) * 2,
                    jnp.float32)
    try:
        # the config is read at trace time, so finish every call on the
        # unpacked view before flipping the toggle
        config.packed_spline_select(False)
        fused_u = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
        y_u, lad_u = fused_u.forward(x)
        z_u, ladi_u = fused_u.inverse(x)
        config.packed_spline_select(True)
        fused_p = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
        y_p, lad_p = fused_p.forward(x)
        z_p, ladi_p = fused_p.inverse(x)
    finally:
        config._state["packed_spline_select"] = None
    np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_u), np.asarray(lad_p),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_u), np.asarray(z_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ladi_u), np.asarray(ladi_p),
                               atol=1e-4)


def test_kernel_dispatch_roll_style():
    """config.packed_spline_select('roll') routes the fused kernel through
    the roll-based packed stage (pltpu roll/repeat structural moves) —
    numerics equal the unpacked chain to reassociation tolerance, through
    the interpret-mode kernel end to end."""
    flow = NeuralSplineFlow(
        features=6, hidden_features=32, num_layers=4,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(5).normal(size=(64, 6)) * 2,
                    jnp.float32)
    try:
        config.packed_spline_select(False)
        fused_u = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
        y_u, lad_u = fused_u.forward(x)
        z_u, ladi_u = fused_u.inverse(x)
        config.packed_spline_select("roll")
        fused_r = fuse_nsf(flow, dtype=jnp.float32, lanes=64, interpret=True)
        y_r, lad_r = fused_r.forward(x)
        z_r, ladi_r = fused_r.inverse(x)
    finally:
        config._state["packed_spline_select"] = None
    np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_u), np.asarray(lad_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_u), np.asarray(z_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ladi_u), np.asarray(ladi_r),
                               atol=1e-4)
    with pytest.raises(ValueError, match="packed_spline_select"):
        config.packed_spline_select("fast")


def test_fused_training_roll_grads_match_xla():
    """Roll-style packed fused training: the in-kernel jax.vjp sweep
    differentiates through the custom_vjp roll/repeat moves; loss and
    gradients match the autodiff'd XLA chain."""
    from nflows_tpu.core.module import combine, partition
    from nflows_tpu.ops.pallas.nsf_fused import _extract
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    flow = NeuralSplineFlow(
        features=6, hidden_features=32, num_layers=3,
        num_blocks_per_layer=2, num_bins=4, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(128, 6)) * 1.5,
                    jnp.float32)
    try:
        config.packed_spline_select("roll")
        trainer = FusedNSFTrainer(flow, batch_size=128, interpret=True)
        fused_loss = float(trainer.loss_fn(trainer.weights, x.T))
        g_fused = jax.grad(trainer.loss_fn)(trainer.weights, x.T)
    finally:
        config._state["packed_spline_select"] = None

    xla_loss_val = float(-flow.log_prob(x).mean())
    assert abs(fused_loss - xla_loss_val) < 1e-4, (fused_loss, xla_loss_val)

    def xla_loss(params, rest):
        return -combine(params, rest).log_prob(x).mean()

    params, rest = partition(flow)
    g_params = jax.grad(xla_loss)(params, rest)
    _, g_ref, _, _, _ = _extract(combine(g_params, rest), jnp.float32,
                                 fold_wh_scale=False)
    for k in ("w0", "b0", "wb", "bb", "wf", "bf"):
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_ref[k]),
            atol=5e-4, err_msg=k)


def test_per_path_default_styles():
    """Unset config resolves 'serving' -> fat (bit-identical, 4-6%
    faster device-only) and 'training' -> unpacked (fat measured 0.91x
    at batch 512) — BASELINE.md round 5; an explicit setting forces
    both; 'auto' resets."""
    from nflows_tpu.ops.pallas.nsf_flow_kernel import _packed_spline_name
    from nflows_tpu.ops.pallas.nsf_train import _family_spline_config

    static = dict(spline="rq", num_blocks=2, tail_bound=3.0,
                  min_bin_width=1e-3, min_bin_height=1e-3,
                  min_derivative=1e-3, min_lambda=None, num_bins=4)
    try:
        config.packed_spline_select("auto")
        assert config._packed_spline_style("serving") == "fat"
        assert config._packed_spline_style("training") is False
        assert _packed_spline_name(
            "rq", config._packed_spline_style("serving")) == "rq_fat"
        _, _, name, style = _family_spline_config(static)
        assert name == "rq" and style is False

        config.packed_spline_select("roll")  # force roll everywhere
        assert config._packed_spline_style("serving") == "roll"
        _, _, name, style = _family_spline_config(static)
        assert name == "rq_packed_roll" and style == "roll"
        assert _packed_spline_name(
            "rq", config._packed_spline_style("serving")
        ) == "rq_packed_roll"

        config.packed_spline_select("auto")
        assert config.packed_spline_select() is False  # getter: forced-or-False
    finally:
        config._state["packed_spline_select"] = None


@pytest.mark.parametrize("family", ["rq", "lrs", "linear", "quadratic",
                                    "cubic"])
@pytest.mark.parametrize("inverse", [False, True])
def test_fat_is_bit_identical(family, inverse):
    """The fat (full-sublane relayout) style must be BIT-identical to
    the unpacked chain: the row-major reshape keeps every element paired
    with its own param rows and no reduction changes association. R=512
    so the relayout actually engages (R=128 is a no-op)."""
    from nflows_tpu.ops.pallas.nsf_flow_kernel import _SPLINES_TR

    Rbig = 512
    nP = {"rq": 3 * K - 1, "lrs": 4 * K - 1, "linear": K,
          "quadratic": 2 * K + 1, "cubic": 2 * K + 2}[family]
    rng = np.random.default_rng(7 + inverse)
    x = jnp.asarray(rng.normal(size=(T, Rbig)) * 2.0, jnp.float32)
    P = jnp.asarray(rng.normal(size=(nP * T, Rbig)) * 0.4, jnp.float32)
    kw = dict(num_bins=K, T=T, inverse=inverse, tail_bound=3.0)
    if family in ("rq", "lrs", "quadratic", "cubic"):
        kw.update(min_bin_width=1e-3, min_bin_height=1e-3)
    if family in ("rq", "lrs"):
        kw.update(min_derivative=1e-3)
    if family == "lrs":
        kw.update(min_lambda=0.025)
    o1, l1 = _SPLINES_TR[family](x, P, **kw)
    o2, l2 = _SPLINES_TR[family + "_fat"](x, P, **kw)
    assert bool(jnp.all(o1 == o2)) and bool(jnp.all(l1 == l2))

    # gradients route through the reshape pair unchanged
    def f(table, P_):
        out, lad = table(x, P_, **kw)
        return jnp.sum(out) + jnp.sum(lad)

    g1 = jax.grad(lambda P_: f(_SPLINES_TR[family], P_))(P)
    g2 = jax.grad(lambda P_: f(_SPLINES_TR[family + "_fat"], P_))(P)
    assert bool(jnp.all(g1 == g2))


def test_kernel_dispatch_fat_style():
    """config.packed_spline_select('fat') routes the fused kernel
    through the full-sublane relayout — end-to-end numerics equal the
    unpacked chain bit-for-bit (lanes=256 so the relayout engages)."""
    flow = NeuralSplineFlow(
        features=6, hidden_features=32, num_layers=4,
        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(5).normal(size=(256, 6)) * 2,
                    jnp.float32)
    try:
        config.packed_spline_select(False)
        fused_u = fuse_nsf(flow, dtype=jnp.float32, lanes=256,
                           interpret=True)
        y_u, lad_u = fused_u.forward(x)
        z_u, ladi_u = fused_u.inverse(x)
        config.packed_spline_select("fat")
        fused_f = fuse_nsf(flow, dtype=jnp.float32, lanes=256,
                           interpret=True)
        y_f, lad_f = fused_f.forward(x)
        z_f, ladi_f = fused_f.inverse(x)
    finally:
        config._state["packed_spline_select"] = None
    assert bool(jnp.all(y_u == y_f)) and bool(jnp.all(lad_u == lad_f))
    assert bool(jnp.all(z_u == z_f)) and bool(jnp.all(ladi_u == ladi_f))
