"""Multi-device tests on the 8-device virtual CPU mesh (conftest.py).

Checks: DP train step matches single-device training numerically, sharded
sampling shapes/uniqueness, TP sharding application.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.flows import MaskedAutoregressiveFlow, SimpleRealNVP
from nflows_tpu.parallel import (
    apply_tensor_parallelism,
    make_mesh,
    make_sharded_sampler,
    make_sharded_train_step,
    shard_batch,
)
from nflows_tpu.training import create_train_state, make_train_step
from nflows_tpu.utils.datasets import make_moons


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    return make_mesh(data=8, model=1)


@pytest.fixture(scope="module")
def mesh_tp():
    return make_mesh(data=4, model=2)


def _setup(seed=0):
    flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1, key=jax.random.key(seed))
    optimizer = optax.adam(1e-3)
    return flow, optimizer


def test_dp_matches_single_device(mesh):
    flow, optimizer = _setup()
    X, _ = make_moons(256, noise=0.1, rng=np.random.default_rng(0))
    batch = jnp.asarray(X)

    state_single = create_train_state(flow, optimizer)
    step_single = make_train_step(optimizer, donate=False)

    state_dp = create_train_state(flow, optimizer)
    step_dp = make_sharded_train_step(optimizer, mesh, donate=False)
    batch_dp = shard_batch(batch, mesh)

    for i in range(5):
        state_single, m_single = step_single(state_single, batch)
        state_dp, m_dp = step_dp(state_dp, batch_dp)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_dp["loss"]), atol=1e-5
        )

    # params identical after 5 steps
    leaves_s = jax.tree_util.tree_leaves(state_single.params)
    leaves_d = jax.tree_util.tree_leaves(state_dp.params)
    for a, b in zip(leaves_s, leaves_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_loss_decreases(mesh):
    flow = MaskedAutoregressiveFlow(features=2, hidden_features=16, num_layers=2,
                                    num_blocks_per_layer=1, key=jax.random.key(1))
    optimizer = optax.adam(3e-3)
    state = create_train_state(flow, optimizer)
    step = make_sharded_train_step(optimizer, mesh, donate=False)
    X, _ = make_moons(512, noise=0.1, rng=np.random.default_rng(1))
    batch = shard_batch(jnp.asarray(X[:256]), mesh)
    _, m0 = step(state, batch)
    for _ in range(30):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_sharded_sampler(mesh):
    flow, _ = _setup()
    sampler = make_sharded_sampler(mesh, num_samples_per_device=16)
    samples = sampler(flow, jax.random.key(0))
    assert samples.shape == (8 * 16, 2)
    arr = np.asarray(samples)
    assert not np.any(np.isnan(arr))
    # per-device key folding must give distinct shards
    assert not np.allclose(arr[:16], arr[16:32])


def test_tensor_parallel_placement(mesh_tp):
    flow, optimizer = _setup()
    flow_tp = apply_tensor_parallelism(flow, mesh_tp)
    # a hidden-layer weight should now be sharded over 'model'
    w = flow_tp.transform.transforms[0].transform_net.blocks[0].linear_0.weight
    assert "model" in str(w.sharding.spec)
    # forward still correct vs unsharded
    X, _ = make_moons(64, noise=0.1, rng=np.random.default_rng(2))
    x = jnp.asarray(X)
    lp_ref = flow.log_prob(x)
    lp_tp = jax.jit(lambda f, z: f.log_prob(z))(flow_tp, x)
    np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_tp), atol=1e-4)


def test_dp_with_context(mesh):
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.transforms import MaskedAffineAutoregressiveTransform

    t = MaskedAffineAutoregressiveTransform(
        features=2, hidden_features=16, context_features=3, key=jax.random.key(0)
    )
    flow = Flow(t, StandardNormal([2]))
    optimizer = optax.adam(1e-3)
    state = create_train_state(flow, optimizer)
    step = make_sharded_train_step(optimizer, mesh, donate=False, with_context=True)
    x = shard_batch(jnp.ones((64, 2)), mesh)
    c = shard_batch(jnp.ones((64, 3)), mesh)
    state, m = step(state, x, c)
    assert np.isfinite(float(m["loss"]))


def test_gspmd_step_preserves_tp_sharding(mesh_tp):
    from nflows_tpu.parallel import make_gspmd_train_step

    flow, optimizer = _setup(3)
    flow_tp = apply_tensor_parallelism(flow, mesh_tp)
    state = create_train_state(flow_tp, optimizer)
    step = make_gspmd_train_step(optimizer, mesh_tp, donate=False)
    X, _ = make_moons(64, noise=0.1, rng=np.random.default_rng(3))
    batch = shard_batch(jnp.asarray(X), mesh_tp)

    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # TP sharding must survive the update (the shard_map DP step would
    # have all-gathered the params to replicated)
    w = state.params.transform.transforms[0].transform_net.blocks[0].linear_0.weight
    assert "model" in str(w.sharding.spec)

    # numerics match the replicated single-device step
    state_ref = create_train_state(flow, optimizer)
    from nflows_tpu.training import make_train_step
    ref_step = make_train_step(optimizer, donate=False)
    state_ref, m_ref = ref_step(state_ref, jnp.asarray(X))
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]), atol=1e-5)


def test_dp_batchnorm_matches_single_device(mesh):
    """Global-batch BatchNorm under explicit shard_map DP: with the batch
    split 8 ways, each device would otherwise normalize with its 32-row
    shard statistics. set_stats_axis (wired into make_sharded_train_step)
    pmean's the moments over ICI so DP training matches single-device
    global-batch training exactly (reference semantics:
    nflows/transforms/normalization.py:87-111 on the full batch)."""
    flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1, key=jax.random.key(3),
                         batch_norm_within_layers=True,
                         batch_norm_between_layers=True)
    # SGD, not Adam: Adam's m/sqrt(v) rescaling amplifies float
    # reduction-order noise (~1e-7) to lr-scale param diffs, masking what
    # this test is about — stats semantics. With SGD, shard-LOCAL stats
    # would diverge by O(1); global stats agree to float tolerance.
    optimizer = optax.sgd(1e-2)
    # non-iid shard layout: sort by x so shard statistics differ wildly
    X, _ = make_moons(256, noise=0.1, rng=np.random.default_rng(3))
    X = X[np.argsort(X[:, 0])]
    batch = jnp.asarray(X)

    state_single = create_train_state(flow, optimizer)
    step_single = make_train_step(optimizer, donate=False)
    state_dp = create_train_state(flow, optimizer)
    step_dp = make_sharded_train_step(optimizer, mesh, donate=False)
    batch_dp = shard_batch(batch, mesh)

    for _ in range(5):
        state_single, m_single = step_single(state_single, batch)
        state_dp, m_dp = step_dp(state_dp, batch_dp)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_dp["loss"]), atol=1e-5
        )
    for a, b in zip(jax.tree_util.tree_leaves(state_single.params),
                    jax.tree_util.tree_leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_batchnorm_running_stats_global(mesh):
    """update_running_stats under the mapped axis uses global moments."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from nflows_tpu.core.module import set_stats_axis
    from nflows_tpu.transforms.normalization import BatchNorm

    bn = BatchNorm(features=2)
    X = np.asarray(
        np.random.default_rng(7).normal(size=(256, 2)) * [1.0, 3.0] + [2.0, -1.0],
        dtype=np.float32,
    )
    X = X[np.argsort(X[:, 0])]  # make shards non-iid

    def local_update(bn, x):
        return set_stats_axis(bn, "data").update_running_stats(x)

    sharded = shard_map(local_update, mesh=mesh, in_specs=(P(), P("data")),
                        out_specs=P(), check_vma=False)
    updated = sharded(bn, jnp.asarray(X))
    expected = bn.update_running_stats(jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(updated.running_mean),
                               np.asarray(expected.running_mean), atol=1e-5)
    np.testing.assert_allclose(np.asarray(updated.running_var),
                               np.asarray(expected.running_var), atol=1e-5)
