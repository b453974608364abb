"""Tests for the pytree module system."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.core.module import Module, buffer, combine, partition, static


class Inner(Module):
    weight: jnp.ndarray
    n: int = static()

    def __init__(self, n):
        self.n = n
        self.weight = jnp.ones((n,))


class Outer(Module):
    inner: Inner
    mask: jnp.ndarray = buffer()
    name: str = static()

    def __init__(self, n, name="outer"):
        self.inner = Inner(n)
        self.mask = jnp.arange(n, dtype=jnp.float32)
        self.name = name


def test_pytree_roundtrip():
    m = Outer(4)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    assert len(leaves) == 2  # weight + mask
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(m2, Outer)
    assert m2.name == "outer"
    np.testing.assert_array_equal(np.asarray(m2.inner.weight), np.ones(4))


def test_immutability():
    m = Outer(4)
    with pytest.raises(dataclasses.FrozenInstanceError):
        m.name = "changed"
    m2 = m.replace(name="changed")
    assert m2.name == "changed" and m.name == "outer"


def test_partition_combine():
    m = Outer(4)
    params, rest = partition(m)
    # mask is a buffer -> must be on the rest side
    assert params.mask is None
    assert rest.mask is not None
    assert params.inner.weight is not None
    assert rest.inner.weight is None
    m2 = combine(params, rest)
    np.testing.assert_array_equal(np.asarray(m2.mask), np.asarray(m.mask))
    np.testing.assert_array_equal(np.asarray(m2.inner.weight), np.asarray(m.inner.weight))


def test_grad_through_partition():
    m = Outer(3)
    params, rest = partition(m)

    def loss(p):
        mm = combine(p, rest)
        return jnp.sum(mm.inner.weight ** 2) + jnp.sum(mm.mask)

    grads = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(grads.inner.weight), 2 * np.ones(3))
    assert grads.mask is None


def test_jit_module_arg():
    m = Outer(4)

    @jax.jit
    def f(mod, x):
        return x * mod.inner.weight + mod.mask

    out = f(m, jnp.ones(4))
    np.testing.assert_allclose(np.asarray(out), 1 + np.arange(4))


def test_num_parameters():
    m = Outer(5)
    assert m.num_parameters() == 5  # mask buffer excluded


def test_int_buffers_not_trainable():
    class P(Module):
        idx: jnp.ndarray = buffer()

        def __init__(self):
            self.idx = jnp.arange(3)

    params, rest = partition(P())
    assert params.idx is None and rest.idx is not None
