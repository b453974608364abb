"""Pipeline-parallel tests on the 8-device virtual CPU mesh (conftest.py).

The GPipe-style microbatch pipeline (parallel/pipeline.py) must be
numerically identical to running the same chain as a plain
CompositeTransform on one device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.transforms import (
    CompositeTransform,
    MaskedAffineAutoregressiveTransform,
    ReversePermutation,
)
from nflows_tpu.parallel import (
    make_pipeline_mesh,
    make_pipelined_transform,
    stack_transforms,
)

FEATURES = 4


def _blocks(n, key, context_features=None):
    keys = jax.random.split(key, n)
    return [
        MaskedAffineAutoregressiveTransform(
            features=FEATURES, hidden_features=8,
            context_features=context_features, key=k,
        )
        for k in keys
    ]


@pytest.fixture(scope="module")
def mesh4():
    return make_pipeline_mesh(4)


def test_forward_matches_chain(mesh4):
    blocks = _blocks(8, jax.random.key(0))
    chain = CompositeTransform(blocks)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(24, FEATURES)),
                    dtype=jnp.float32)

    piped = make_pipelined_transform(blocks, mesh4, num_microbatches=6)
    y_p, lad_p = piped(x)
    y_c, lad_c = chain.forward(x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_p), np.asarray(lad_c), atol=1e-5)


def test_inverse_matches_chain(mesh4):
    blocks = _blocks(4, jax.random.key(1))
    chain = CompositeTransform(blocks)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(16, FEATURES)),
                    dtype=jnp.float32)

    piped = make_pipelined_transform(
        blocks, mesh4, num_microbatches=4, direction="inverse"
    )
    x_p, lad_p = piped(y)
    x_c, lad_c = chain.inverse(y)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_p), np.asarray(lad_c), atol=1e-5)


def test_forward_with_context(mesh4):
    blocks = _blocks(4, jax.random.key(2), context_features=3)
    chain = CompositeTransform(blocks)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(12, FEATURES)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(12, 3)), dtype=jnp.float32)

    piped = make_pipelined_transform(blocks, mesh4, num_microbatches=3)
    y_p, lad_p = piped(x, ctx)
    y_c, lad_c = chain.forward(x, ctx)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_p), np.asarray(lad_c), atol=1e-5)


def test_eight_stages_single_microbatch():
    mesh = make_pipeline_mesh(8)
    blocks = _blocks(8, jax.random.key(3))
    chain = CompositeTransform(blocks)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, FEATURES)),
                    dtype=jnp.float32)
    piped = make_pipelined_transform(blocks, mesh, num_microbatches=1)
    y_p, lad_p = piped(x)
    y_c, lad_c = chain.forward(x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_p), np.asarray(lad_c), atol=1e-5)


def test_single_stage_degenerates_to_chain():
    mesh = make_pipeline_mesh(1)
    blocks = _blocks(2, jax.random.key(4))
    chain = CompositeTransform(blocks)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(8, FEATURES)),
                    dtype=jnp.float32)
    piped = make_pipelined_transform(blocks, mesh, num_microbatches=2)
    y_p, lad_p = piped(x)
    y_c, lad_c = chain.forward(x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lad_p), np.asarray(lad_c), atol=1e-5)


def test_heterogeneous_blocks_rejected():
    blocks = _blocks(1, jax.random.key(5)) + [ReversePermutation(FEATURES)]
    with pytest.raises(ValueError, match="structurally identical"):
        stack_transforms(blocks)


def test_block_count_must_divide_stages(mesh4):
    blocks = _blocks(6, jax.random.key(6))
    with pytest.raises(ValueError, match="not divisible"):
        make_pipelined_transform(blocks, mesh4, num_microbatches=2)
