"""Checkpoint/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.flows import MaskedAutoregressiveFlow
from nflows_tpu.training import create_train_state, make_train_step
from nflows_tpu.training.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)


def _state():
    flow = MaskedAutoregressiveFlow(features=3, hidden_features=8, num_layers=2,
                                    num_blocks_per_layer=1, key=jax.random.key(0))
    opt = optax.adam(1e-3)
    return flow, opt, create_train_state(flow, opt)


def test_save_restore_roundtrip(tmp_path):
    flow, opt, state = _state()
    step = make_train_step(opt, donate=False)
    x = jax.random.normal(jax.random.key(1), (32, 3))
    for _ in range(3):
        state, _ = step(state, x)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)

    # fresh template with different values
    _, _, template = _state()
    restored = restore_checkpoint(path, template)

    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training resumes identically from the restored state
    s1, m1 = step(state, x)
    s2, m2 = step(restored, x)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)


def test_checkpoint_manager_rotation(tmp_path):
    flow, opt, state = _state()
    step = make_train_step(opt, donate=False)
    x = jax.random.normal(jax.random.key(1), (32, 3))

    mgr = CheckpointManager(str(tmp_path / "run"), max_to_keep=2)
    for i in range(4):
        state, _ = step(state, x)
        mgr.save(int(state.step), state)
    assert mgr.latest_step() == 4

    _, _, template = _state()
    restored = mgr.restore(template)
    assert int(restored.step) == 4
    mgr.close()


def test_async_save_overlaps_and_restores_exactly(tmp_path):
    """Async (default) saves return before the write completes; restore
    barriers on the in-flight write and round-trips exactly. sync mode
    (async_save=False) writes through."""
    flow, opt, state = _state()
    step = make_train_step(opt, donate=False)
    x = jax.random.normal(jax.random.key(1), (32, 3))

    mgr = CheckpointManager(str(tmp_path / "arun"), max_to_keep=2)
    state, _ = step(state, x)
    mgr.save(int(state.step), state)
    # training continues while the write is in flight; the snapshot must
    # be of the state AT save time, not the stepped-past state
    stepped, _ = step(state, x)
    _, _, template = _state()
    restored = mgr.restore(template)  # barriers internally
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.wait_until_finished()  # explicit barrier is also public API
    mgr.close()

    sync = CheckpointManager(str(tmp_path / "srun"), async_save=False)
    sync.save(int(stepped.step), stepped)
    restored2 = sync.restore(template)
    for a, b in zip(jax.tree_util.tree_leaves(stepped.params),
                    jax.tree_util.tree_leaves(restored2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sync.close()
