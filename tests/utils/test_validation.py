"""Checkified domain-error detection (SURVEY.md §5: the in-jit analogue of
the reference's InputOutsideDomain raises)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.transforms import Logit
from nflows_tpu.utils import checkify_wrap, domain_checked_forward


def test_domain_checked_forward_raises_outside_domain():
    fn = domain_checked_forward(Logit(), low=0.0, high=1.0)
    ok = jnp.asarray([[0.2, 0.8], [0.5, 0.4]], dtype=jnp.float32)
    y, lad = fn(ok)
    assert np.all(np.isfinite(np.asarray(y)))

    bad = jnp.asarray([[0.2, 1.7], [0.5, 0.4]], dtype=jnp.float32)
    with pytest.raises(Exception, match="outside domain"):
        fn(bad)


def test_checkify_wrap_catches_nan():
    def log_of(x):
        return jnp.log(x)

    checked = checkify_wrap(log_of)
    assert np.isfinite(float(checked(jnp.asarray(2.0))))
    with pytest.raises(Exception, match="nan"):
        checked(jnp.asarray(-1.0))


def test_checkify_wrap_on_flow_log_prob():
    from nflows_tpu.flows import SimpleRealNVP

    flow = SimpleRealNVP(features=2, hidden_features=8, num_layers=1,
                         num_blocks_per_layer=1, key=jax.random.key(0))
    checked = checkify_wrap(lambda f, x: f.log_prob(x))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)),
                    dtype=jnp.float32)
    lp = checked(flow, x)
    assert np.all(np.isfinite(np.asarray(lp)))
    with pytest.raises(Exception):
        checked(flow, x.at[0, 0].set(jnp.nan))
