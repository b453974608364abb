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


def test_namedtuple_pytrees_survive_split_and_set_training():
    """Regression: optax states are NamedTuples; type(x)(generator) broke
    partition/_split and set_training (confirmed crash)."""
    import jax
    import optax

    from nflows_tpu.core.module import partition, set_training
    from nflows_tpu.flows import SimpleRealNVP
    from nflows_tpu.training import create_train_state

    flow = SimpleRealNVP(features=2, hidden_features=8, num_layers=1,
                         num_blocks_per_layer=1, key=jax.random.key(0),
                         batch_norm_between_layers=True)
    state = create_train_state(flow, optax.adam(1e-3))
    params, rest = partition(state)  # crashed before the fix
    assert params is not None and rest is not None
    out = set_training(state, False)
    assert type(out.opt_state) is type(state.opt_state)
