"""Preemption recovery on a mesh: save a TP-sharded TrainState, restore it
onto the mesh with shardings intact, and continue training identically."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.flows import SimpleRealNVP
from nflows_tpu.parallel import (
    apply_tensor_parallelism,
    make_gspmd_train_step,
    make_mesh,
    shard_batch,
)
from nflows_tpu.training import create_train_state
from nflows_tpu.training.checkpoint import restore_checkpoint, save_checkpoint


def test_sharded_state_roundtrip(tmp_path):
    mesh = make_mesh(data=4, model=2)
    flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1, key=jax.random.key(0))
    flow = apply_tensor_parallelism(flow, mesh)
    opt = optax.adam(1e-3)
    state = create_train_state(flow, opt)
    step = make_gspmd_train_step(opt, mesh, donate=False)
    batch = shard_batch(jnp.asarray(
        np.random.default_rng(0).normal(size=(32, 2)), dtype=jnp.float32), mesh)
    state, _ = step(state, batch)

    save_checkpoint(str(tmp_path / "ckpt"), state)
    template = create_train_state(flow, opt)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template)

    # values identical
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # TP sharding survives the round trip
    w = restored.params.transform.transforms[0].transform_net.blocks[0].linear_0.weight
    assert "model" in str(w.sharding.spec)

    # training continues bit-identically from the restored state
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=0)
