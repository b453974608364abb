"""Pallas cubic-spline kernel vs the XLA reference (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.ops import splines
from nflows_tpu.ops.pallas.cubic_spline import cubic_spline_pallas

B, D, K = 64, 6, 8


def _params(seed=0):
    keys = jax.random.split(jax.random.key(seed), 5)
    x = 2.5 * jax.random.normal(keys[0], (B, D))
    w = jax.random.normal(keys[1], (B, D, K))
    h = jax.random.normal(keys[2], (B, D, K))
    dl = jax.random.normal(keys[3], (B, D, 1))
    dr = jax.random.normal(keys[4], (B, D, 1))
    return x, w, h, dl, dr


@pytest.mark.parametrize("inverse", [False, True])
def test_matches_reference(inverse):
    x, w, h, dl, dr = _params()
    ref_out, ref_lad = splines.unconstrained_cubic_spline(
        x, w, h, dl, dr, inverse=inverse, tails="linear", tail_bound=3.0)
    pl_out, pl_lad = cubic_spline_pallas(
        x, w, h, dl, dr, inverse=inverse, tail_bound=3.0, interpret=True)
    np.testing.assert_allclose(np.asarray(pl_out), np.asarray(ref_out),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(pl_lad), np.asarray(ref_lad),
                               atol=5e-4)


def test_roundtrip():
    x, w, h, dl, dr = _params(1)
    y, lad = cubic_spline_pallas(x, w, h, dl, dr, tail_bound=3.0,
                                 interpret=True)
    x_rec, lad_inv = cubic_spline_pallas(y, w, h, dl, dr, inverse=True,
                                         tail_bound=3.0, interpret=True)
    # cubic root-solve round-trip tolerance matches the XLA suite
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)


def test_gradients_match_reference():
    x, w, h, dl, dr = _params(2)

    def loss_pl(x, w, h, dl, dr):
        out, lad = cubic_spline_pallas(x, w, h, dl, dr, tail_bound=3.0,
                                       interpret=True)
        return jnp.sum(out ** 2) + jnp.sum(lad)

    def loss_ref(x, w, h, dl, dr):
        out, lad = splines.unconstrained_cubic_spline(
            x, w, h, dl, dr, tails="linear", tail_bound=3.0)
        return jnp.sum(out ** 2) + jnp.sum(lad)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4))(x, w, h, dl, dr)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, h, dl, dr)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
