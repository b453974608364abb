"""FSDP evidence (mirrors test_tp_evidence.py's bar): parameter/ZeRO
sharding must (a) cut per-device parameter+optimizer memory ~1/N on the
sharded leaves, (b) place gather/scatter collectives in the compiled
step, and (c) keep numerics identical to the replicated path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.parallel import (
    apply_fsdp,
    apply_tensor_parallelism,
    fsdp_sharding,
    make_mesh,
)
from nflows_tpu.parallel.train import (
    make_gspmd_train_step,
    tensor_parallel_sharding,
)
from nflows_tpu.training import create_train_state


def _wide_flow(hidden=512, seed=0):
    return NeuralSplineFlow(features=6, hidden_features=hidden, num_layers=2,
                            num_blocks_per_layer=2, num_bins=4,
                            key=jax.random.key(seed),
                            rng=np.random.default_rng(seed))


def _per_device_nbytes(tree):
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            total += leaf.addressable_shards[0].data.nbytes
        elif hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total


def _batch(n=64, seed=1):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(n, 6)),
                       dtype=jnp.float32)


def test_fsdp_cuts_per_device_param_and_opt_memory():
    flow = _wide_flow()
    mesh = make_mesh(data=8)
    flow_fsdp = apply_fsdp(flow, mesh)

    opt = optax.adam(1e-3)
    state_rep = create_train_state(flow, opt)
    state_fsdp = create_train_state(flow_fsdp, opt)

    rep_bytes = _per_device_nbytes(state_rep.params)
    fsdp_bytes = _per_device_nbytes(state_fsdp.params)
    # hidden=512 conditioners dominate: well under 1/4 of replicated
    # (small leaves stay replicated, so not exactly 1/8)
    assert fsdp_bytes < rep_bytes / 4, (fsdp_bytes, rep_bytes)

    # Adam moments inherit the shardings
    mu_rep = _per_device_nbytes(state_rep.opt_state[0].mu)
    mu_fsdp = _per_device_nbytes(state_fsdp.opt_state[0].mu)
    assert mu_fsdp < mu_rep / 4, (mu_fsdp, mu_rep)


def test_fsdp_places_collectives_and_keeps_shardings():
    flow = _wide_flow()
    mesh = make_mesh(data=8)
    flow_fsdp = apply_fsdp(flow, mesh)
    opt = optax.adam(1e-3)
    state = create_train_state(flow_fsdp, opt)
    step = make_gspmd_train_step(opt, mesh)
    batch = _batch(128)

    hlo = step.lower(state, batch).compile().as_text()
    # the FSDP signature: params are gathered at use; grads come back as
    # shards (XLA may emit reduce-scatter or all-reduce+dynamic-slice)
    assert "all-gather" in hlo or "all-gather-start" in hlo, hlo[:2000]

    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # updated params keep their FSDP shardings (memory win persists
    # across steps, nothing silently re-replicates)
    before = jax.tree_util.tree_leaves(state.params)
    after = jax.tree_util.tree_leaves(new_state.params)
    n_sharded_before = sum(
        1 for a in before
        if hasattr(a, "sharding") and
        any(s is not None for s in getattr(a.sharding, "spec", ()))
    )
    n_sharded_after = sum(
        1 for a in after
        if hasattr(a, "sharding") and
        any(s is not None for s in getattr(a.sharding, "spec", ()))
    )
    assert n_sharded_before > 0
    assert n_sharded_after >= n_sharded_before


def test_fsdp_matches_replicated_numerics():
    opt = optax.adam(1e-3)
    mesh = make_mesh(data=8)

    flow = _wide_flow(hidden=128)
    state_rep = create_train_state(flow, opt)
    state_fsdp = create_train_state(apply_fsdp(flow, mesh), opt)

    # donate=False: the two states alternate through one jit cache here
    step = make_gspmd_train_step(opt, mesh, donate=False)
    for i in range(3):
        b = _batch(128, seed=10 + i)
        state_rep, m_rep = step(state_rep, b)
        state_fsdp, m_fsdp = step(state_fsdp, b)
        np.testing.assert_allclose(float(m_rep["loss"]),
                                   float(m_fsdp["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_rep.params),
                    jax.tree_util.tree_leaves(state_fsdp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_composes_with_tp():
    """2-D layout: TP shards conditioner hiddens over 'model', FSDP
    shards what TP left replicated over 'data'."""
    flow = _wide_flow()
    mesh = make_mesh(data=2, model=4)
    flow_tp = apply_tensor_parallelism(flow, mesh)
    tp_spec = tensor_parallel_sharding(flow, mesh)
    flow_2d = apply_fsdp(flow_tp, mesh, respect=tp_spec)

    # TP leaves keep their model sharding
    n_model = n_data = 0
    for leaf in jax.tree_util.tree_leaves(flow_2d):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is None:
            continue
        axes = [a for a in spec if a is not None]
        if "model" in axes:
            n_model += 1
        elif "data" in axes:
            n_data += 1
    assert n_model > 0 and n_data > 0, (n_model, n_data)

    opt = optax.adam(1e-3)
    state = create_train_state(flow_2d, opt)
    step = make_gspmd_train_step(opt, mesh)
    state, metrics = step(state, _batch(128))
    assert np.isfinite(float(metrics["loss"]))


def test_fsdp_sharding_skips_small_and_integer_leaves():
    flow = _wide_flow(hidden=128)
    mesh = make_mesh(data=8)
    shardings = fsdp_sharding(flow, mesh)
    for leaf, sh in zip(jax.tree_util.tree_leaves(flow),
                        jax.tree_util.tree_leaves(shardings)):
        if not hasattr(leaf, "dtype"):
            continue
        spec = getattr(sh, "spec", None)
        sharded = spec is not None and any(a is not None for a in spec)
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            assert not sharded  # permutation indices etc. stay replicated
        if leaf.size < 8192:
            assert not sharded


def test_min_shard_elements_kwarg():
    """The leaf-size floor is a public knob: lowering it shards leaves the
    default (8192 elements) would leave replicated."""
    mesh = make_mesh(data=8)
    flow = NeuralSplineFlow(features=6, hidden_features=32, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))

    def n_sharded(f):
        return sum(
            1 for leaf in jax.tree_util.tree_leaves(f)
            if hasattr(leaf, "sharding")
            and any(s is not None
                    for s in getattr(leaf.sharding, "spec", ())))

    default = apply_fsdp(flow, mesh)
    small = apply_fsdp(flow, mesh, min_shard_elements=64)
    assert n_sharded(small) > n_sharded(default)
    # fsdp_sharding accepts it too (apply_fsdp just forwards)
    specs = fsdp_sharding(flow, mesh, min_shard_elements=64)
    sharded_specs = [
        s for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: x is None)
        if s is not None and any(a is not None for a in s.spec)]
    assert len(sharded_specs) == n_sharded(small)
