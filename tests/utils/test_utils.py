"""Utils tests (reference: tests/utils/torchutils_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu import utils
from nflows_tpu.utils import typechecks


def test_tile():
    np.testing.assert_array_equal(
        np.asarray(utils.tile(jnp.asarray([1, 2]), 3)), [1, 1, 1, 2, 2, 2]
    )


def test_sum_except_batch():
    x = jnp.ones((4, 3, 2))
    np.testing.assert_array_equal(np.asarray(utils.sum_except_batch(x)), 6 * np.ones(4))
    np.testing.assert_array_equal(
        np.asarray(utils.sum_except_batch(x, num_batch_dims=2)).shape, (4, 3)
    )


def test_split_merge_leading_dims_roundtrip():
    x = jnp.arange(24).reshape(6, 4)
    split = utils.split_leading_dim(x, [2, 3])
    assert split.shape == (2, 3, 4)
    merged = utils.merge_leading_dims(split, 2)
    np.testing.assert_array_equal(np.asarray(merged), np.asarray(x))


def test_repeat_rows():
    x = jnp.asarray([[1, 2], [3, 4]])
    out = utils.repeat_rows(x, 2)
    np.testing.assert_array_equal(np.asarray(out), [[1, 2], [1, 2], [3, 4], [3, 4]])


def test_searchsorted():
    edges = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]])
    x = jnp.asarray([0.1, 0.3, 0.5, 0.99, 1.0])
    idx = utils.searchsorted(jnp.broadcast_to(edges, (5, 5)), x)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3, 3])


def test_searchsorted_arbitrary_shape():
    rng = np.random.default_rng(0)
    edges = np.sort(rng.uniform(size=(2, 3, 11)), axis=-1)
    x = rng.uniform(size=(2, 3)).astype(np.float32)
    idx = np.asarray(utils.searchsorted(jnp.asarray(edges), jnp.asarray(x)))
    for i in range(2):
        for j in range(3):
            k = idx[i, j]
            if x[i, j] < edges[i, j, 0]:
                assert k == 0  # clamped below the first edge
            elif x[i, j] > edges[i, j, -1]:
                assert k == edges.shape[-1] - 2  # clamped above the last
            else:
                assert edges[i, j, k] <= x[i, j] <= edges[i, j, k + 1] + 1e-6


def test_logabsdet_matches_slogdet():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5)).astype(np.float32)
    np.testing.assert_allclose(
        float(utils.logabsdet(jnp.asarray(A))), np.linalg.slogdet(A)[1], atol=1e-5
    )


def test_random_orthogonal():
    Q = np.asarray(utils.random_orthogonal(6, key=jax.random.key(0)))
    np.testing.assert_allclose(Q @ Q.T, np.eye(6), atol=1e-5)


def test_cbrt():
    x = jnp.asarray([-8.0, 0.0, 27.0])
    np.testing.assert_allclose(np.asarray(utils.cbrt(x)), [-2, 0, 3], atol=1e-5)


def test_masks():
    m = utils.create_alternating_binary_mask(5)
    np.testing.assert_array_equal(m, [1, 0, 1, 0, 1])
    m = utils.create_alternating_binary_mask(5, even=False)
    np.testing.assert_array_equal(m, [0, 1, 0, 1, 0])
    m = utils.create_mid_split_binary_mask(5)
    np.testing.assert_array_equal(m, [1, 1, 1, 0, 0])
    m = utils.create_random_binary_mask(6, rng=np.random.default_rng(0))
    assert m.sum() == 3


def test_gaussian_kde_log_eval():
    samples = jnp.zeros((100, 2))
    lp = utils.gaussian_kde_log_eval(samples, jnp.zeros(2))
    assert np.isfinite(float(lp))


def test_get_temperature():
    t = utils.get_temperature(jnp.asarray(5.0))
    assert np.isfinite(float(t))


def test_typechecks():
    assert typechecks.is_positive_int(3)
    assert not typechecks.is_positive_int(0)
    assert not typechecks.is_positive_int(True)
    assert typechecks.is_nonnegative_int(0)
    assert typechecks.is_power_of_two(8)
    assert not typechecks.is_power_of_two(6)
    assert typechecks.is_bool(False)
