"""Feature-sharded elementwise (SP-analogue) tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.parallel import make_feature_sharded_elementwise, make_mesh
from nflows_tpu.transforms import (
    PiecewiseQuadraticCDF,
    PiecewiseRationalQuadraticCDF,
)

FEATURES = 16


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=8, model=1)


def _transform(cls, seed):
    t = cls(shape=[FEATURES], num_bins=5, tails="linear", tail_bound=2.0)
    # randomize params so the test isn't at the identity point
    leaves, treedef = jax.tree_util.tree_flatten(t)
    key = jax.random.key(seed)
    new = []
    for leaf in leaves:
        key, sub = jax.random.split(key)
        new.append(jax.random.normal(sub, jnp.shape(leaf)) * 0.3)
    return jax.tree_util.tree_unflatten(treedef, new)


@pytest.mark.parametrize("cls", [PiecewiseRationalQuadraticCDF,
                                 PiecewiseQuadraticCDF])
@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_matches_unsharded(mesh, cls, direction):
    t = _transform(cls, 0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, FEATURES)),
                    dtype=jnp.float32)
    fn = make_feature_sharded_elementwise(t, mesh, direction=direction)
    y_s, lad_s = fn(x)
    y_r, lad_r = (t.inverse if direction == "inverse" else t.forward)(x)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_s), np.asarray(lad_r), atol=1e-5)
