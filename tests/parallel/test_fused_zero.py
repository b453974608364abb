"""Fused training x ZeRO optimizer-state sharding (round-5 VERDICT item
2): FusedNSFTrainer.make_zero_train_step keeps kernel weights replicated
(VMEM-resident) but shards the fp32 Adam moments over the data axis —
per-device optimizer memory must drop like FSDP's bar
(tests/parallel/test_fsdp.py), step numerics must equal the unsharded
fused step, and the compiled step must place the ZeRO collectives
(reduce-scatter'd grads, all-gathered updated weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer


def _flow(hidden=32, layers=3, seed=0):
    return NeuralSplineFlow(
        features=6, hidden_features=hidden, num_layers=layers,
        num_blocks_per_layer=2, num_bins=4, tail_bound=3.0,
        key=jax.random.key(seed), rng=np.random.default_rng(seed))


def _mesh():
    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest must provide 8 virtual devices"
    return Mesh(devices, ("data",))


def _per_device_nbytes(tree):
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            total += leaf.addressable_shards[0].data.nbytes
        elif hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total


def test_zero_step_equals_single_device():
    mesh = _mesh()
    batch = jnp.asarray(
        np.random.default_rng(1).normal(size=(1024, 6)) * 1.5, jnp.float32)
    opt = optax.adam(3e-4)

    tr = FusedNSFTrainer(_flow(), batch_size=1024, interpret=True)
    w0 = tr.weights

    single = tr.make_train_step(opt, donate=False)
    w1, s1, loss1 = single(w0, tr.init_opt(opt), batch)

    zero = tr.make_zero_train_step(opt, mesh, donate=False,
                                   min_shard_elements=64)
    w2, s2, loss2 = zero(w0, tr.init_opt_sharded(opt, mesh,
                                                 min_shard_elements=64),
                         batch)

    # sum-of-shard-means / n == global mean up to fp32 reassociation
    assert abs(float(loss1) - float(loss2)) < 1e-5
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   atol=1e-6, err_msg=k)
    # a second step from the sharded state stays consistent too
    w1b, _, loss1b = single(w1, s1, batch)
    w2b, _, loss2b = zero(w2, s2, batch)
    assert abs(float(loss1b) - float(loss2b)) < 1e-5
    for k in w1b:
        np.testing.assert_allclose(np.asarray(w1b[k]), np.asarray(w2b[k]),
                                   atol=1e-6, err_msg=k)


def test_zero_cuts_per_device_opt_memory():
    """VERDICT round-4 item-2 bar: per-device opt-state memory <
    replicated/2 at hidden >= 512 on the 8-device mesh (the wb
    conditioner moments dominate and shard 1/8)."""
    mesh = _mesh()
    opt = optax.adam(1e-3)
    tr = FusedNSFTrainer(_flow(hidden=512, layers=2), batch_size=1024,
                         interpret=True)

    rep_bytes = _per_device_nbytes(tr.init_opt(opt))
    zero_bytes = _per_device_nbytes(tr.init_opt_sharded(opt, mesh))
    assert zero_bytes < rep_bytes / 4, (zero_bytes, rep_bytes)

    # the kernel weights themselves stay replicated — full per-device copy
    assert _per_device_nbytes(tr.weights) == sum(
        w.nbytes for w in tr.weights.values())


def test_zero_places_collectives():
    mesh = _mesh()
    opt = optax.adam(1e-3)
    tr = FusedNSFTrainer(_flow(), batch_size=1024, interpret=True)
    step = tr.make_zero_train_step(opt, mesh, donate=False,
                                   min_shard_elements=64)
    batch = jnp.zeros((1024, 6), jnp.float32)
    opt_state = tr.init_opt_sharded(opt, mesh, min_shard_elements=64)

    hlo = step.lower(tr.weights, opt_state, batch).compile().as_text()
    # grads reduce-scatter to moment shards (XLA may spell it
    # reduce-scatter or all-reduce+dynamic-slice); updated weights
    # all-gather back to replicated
    assert ("reduce-scatter" in hlo or "all-reduce" in hlo), hlo[:2000]
    assert "all-gather" in hlo, hlo[:2000]


def test_zero_rejects_misaligned_per_device_batch():
    mesh = _mesh()
    tr = FusedNSFTrainer(_flow(), batch_size=512, interpret=True)
    with pytest.raises(ValueError, match="per-device"):
        tr.make_zero_train_step(optax.adam(1e-3), mesh)
