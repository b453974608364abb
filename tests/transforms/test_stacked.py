"""StackedTransform (lax.scan over layer-stacked params) must match the
unrolled CompositeTransform exactly — outputs, logabsdet, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.core.module import combine, partition
from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.transforms import (
    CompositeTransform,
    MaskedAffineAutoregressiveTransform,
    ReversePermutation,
    StackedTransform,
    stack_transforms,
)


def _nsf_pair(features=6, num_layers=4, hidden=32, seed=0):
    kw = dict(features=features, hidden_features=hidden, num_layers=num_layers,
              num_blocks_per_layer=2, num_bins=4, tail_bound=3.0,
              key=jax.random.key(seed))
    unrolled = NeuralSplineFlow(rng=np.random.default_rng(seed),
                                stacked=False, **kw)
    stacked = NeuralSplineFlow(rng=np.random.default_rng(seed), stacked=True, **kw)
    return unrolled, stacked


def test_nsf_stacked_matches_unrolled_forward_inverse():
    unrolled, stacked = _nsf_pair()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(32, 6)),
                    dtype=jnp.float32)

    yu, ldu = unrolled.transform.forward(x)
    ys, lds = stacked.transform.forward(x)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(ys), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldu), np.asarray(lds), atol=1e-5)

    xu, ldiu = unrolled.transform.inverse(yu)
    xs, ldis = stacked.transform.inverse(yu)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldiu), np.asarray(ldis), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x), atol=1e-4)


def test_nsf_stacked_log_prob_and_sample():
    unrolled, stacked = _nsf_pair()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 6)),
                    dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(unrolled.log_prob(x)), np.asarray(stacked.log_prob(x)),
        atol=1e-5)
    su = unrolled.sample(jax.random.key(3), 64)
    ss = stacked.sample(jax.random.key(3), 64)
    np.testing.assert_allclose(np.asarray(su), np.asarray(ss), atol=1e-5)


def test_nsf_stacked_gradients_match():
    unrolled, stacked = _nsf_pair(num_layers=3)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(24, 6)),
                    dtype=jnp.float32)

    def loss(params, rest):
        return -jnp.mean(combine(params, rest).log_prob(x))

    pu, ru = partition(unrolled)
    ps, rs = partition(stacked)
    lu, gu = jax.value_and_grad(loss)(pu, ru)
    ls, gs = jax.value_and_grad(loss)(ps, rs)
    np.testing.assert_allclose(float(lu), float(ls), atol=1e-6)

    # stacked grads: layer-stacked leaves; compare layer slices to unrolled
    gs_layers = [jax.tree_util.tree_map(lambda a: a[i], gs.transform.stacked)
                 for i in range(3)]
    gu_layers = gu.transform.transforms
    for i in range(3):
        a = jax.tree_util.tree_leaves(gs_layers[i])
        b = jax.tree_util.tree_leaves(gu_layers[2 * i: 2 * i + 2])
        assert len(a) == len(b)
        for la, lb in zip(a, b):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-5)


def test_stack_transforms_generic_maf_chain():
    keys = jax.random.split(jax.random.key(0), 4)
    groups = [
        CompositeTransform([
            ReversePermutation(4),
            MaskedAffineAutoregressiveTransform(
                features=4, hidden_features=16, key=keys[i]),
        ])
        for i in range(4)
    ]
    stacked = stack_transforms(groups)
    unrolled = CompositeTransform(groups)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(8, 4)),
                    dtype=jnp.float32)
    yu, ldu = unrolled.forward(x)
    ys, lds = stacked.forward(x)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(ys), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldu), np.asarray(lds), atol=1e-6)
    xu, _ = unrolled.inverse(yu)
    xs, _ = stacked.inverse(yu)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xs), atol=1e-5)


def test_stack_transforms_rejects_heterogeneous():
    keys = jax.random.split(jax.random.key(0), 2)
    with pytest.raises(ValueError):
        stack_transforms([
            MaskedAffineAutoregressiveTransform(features=4, hidden_features=16,
                                                key=keys[0]),
            MaskedAffineAutoregressiveTransform(features=4, hidden_features=32,
                                                key=keys[1]),
        ])
    # odd feature counts are supported since round 3 (fixed ceil/floor
    # split) — see test_nsf_stacked_odd_features


def test_stacked_layer_roundtrip():
    _, stacked = _nsf_pair(num_layers=3)
    st = stacked.transform
    assert isinstance(st, StackedTransform)
    assert st.num_layers == 3
    relayered = stack_transforms(st.layers())
    a = jax.tree_util.tree_leaves(st)
    b = jax.tree_util.tree_leaves(relayered)
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb))


def test_stacked_dropout_uses_distinct_per_layer_keys():
    """Regression: the scan body is traced once, so an ambient dropout key
    would be a scan-invariant constant — every layer would apply the SAME
    mask. StackedTransform must thread per-layer keys through the scan;
    semantics are pinned as: fold the ambient frame counter, split L ways,
    one sub-frame per layer."""
    from nflows_tpu.core.stochastic import stochastic

    _, stacked = _nsf_pair(num_layers=3)
    # rebuild with dropout active
    kw = dict(features=6, hidden_features=32, num_layers=3,
              num_blocks_per_layer=2, num_bins=4, tail_bound=3.0,
              key=jax.random.key(0), dropout_probability=0.5)
    flow = NeuralSplineFlow(rng=np.random.default_rng(0), stacked=True, **kw)
    st = flow.transform
    x = jnp.asarray(np.random.default_rng(1).normal(size=(64, 6)),
                    dtype=jnp.float32)
    key = jax.random.key(42)

    def run(z, k):
        with stochastic(k):
            return st.forward(z)

    y1, ld1 = jax.jit(run)(x, key)
    y2, ld2 = jax.jit(run)(x, key)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))  # deterministic

    # manual replication of the documented key schedule
    def run_manual(z, k):
        keys = jax.random.split(jax.random.fold_in(k, 0), 3)
        lad = jnp.zeros(z.shape[0], dtype=z.dtype)
        for i in range(3):
            layer = st.layer(i)
            with stochastic(keys[i]):
                z, ld = layer.forward(z)
            lad = lad + ld
        return z, lad

    ym, ldm = jax.jit(run_manual)(x, key)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ym), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ldm), atol=1e-5)

    # and dropout must actually differ from the no-dropout path (masks on)
    y_eval, _ = st.forward(x)
    assert not np.allclose(np.asarray(y1), np.asarray(y_eval))


def test_nsf_stacked_odd_features():
    """Round-3 VERDICT item 1: odd feature counts run scan-stacked via a
    fixed ceil(d/2)/floor(d/2) split (the preceding RandomPermutation
    supplies the mixing). Numerics and gradients must equal the unrolled
    materialization of the SAME layers."""
    d = 21
    flow = NeuralSplineFlow(features=d, hidden_features=16, num_layers=4,
                            num_blocks_per_layer=1, num_bins=4, stacked=True,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    st = flow.transform
    assert isinstance(st, StackedTransform)
    unrolled = CompositeTransform(
        [t for g in st.layers() for t in g.transforms])

    x = jnp.asarray(np.random.default_rng(1).normal(size=(16, d)),
                    dtype=jnp.float32)
    ys, lds = st.forward(x)
    yu, ldu = unrolled.forward(x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lds), np.asarray(ldu), atol=1e-5)
    xs, _ = st.inverse(ys)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x), atol=1e-4)

    # distinct permutations per layer (mixing really happens)
    perms = [np.asarray(g.transforms[0].permutation) for g in st.layers()]
    assert any(not np.array_equal(perms[0], p) for p in perms[1:])

    # gradient equality stacked vs unrolled (trainable leaves only)
    def loss(params, rest):
        y, ld = combine(params, rest).forward(x)
        return jnp.mean(y ** 2) - jnp.mean(ld)

    ps, rs = partition(st)
    pu, ru = partition(unrolled)
    gs = jax.grad(loss)(ps, rs)
    gu = jax.grad(loss)(pu, ru)
    gs_layers = [jax.tree_util.tree_leaves(
                     jax.tree_util.tree_map(lambda a, i=i: a[i], gs.stacked))
                 for i in range(st.num_layers)]
    gu_flat = jax.tree_util.tree_leaves(gu)
    gs_flat = [leaf for layer in gs_layers for leaf in layer]
    assert len(gs_flat) == len(gu_flat)
    for a, b in zip(gs_flat, gu_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_nsf_stacked_odd_features_fusable():
    """Odd-d stacked flows must qualify for the fused megakernel
    (homogeneous ceil/floor split) and agree with the XLA chain."""
    from nflows_tpu.ops.pallas.nsf_fused import can_fuse_nsf, fuse_nsf

    d = 7
    flow = NeuralSplineFlow(features=d, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4, stacked=True,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    assert can_fuse_nsf(flow)
    fused = fuse_nsf(flow, dtype=jnp.float32, lanes=128, interpret=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, d)),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fused.log_prob(x)),
                               np.asarray(flow.log_prob(x)), atol=1e-4)


def test_nsf_stacked_odd_features_requires_random_permutations():
    with pytest.raises(ValueError, match="odd feature count"):
        NeuralSplineFlow(features=5, hidden_features=8, num_layers=2,
                         stacked=True, use_random_permutations=False,
                         key=jax.random.key(0))


def test_nsf_auto_selects_stacked_by_width():
    """stacked=None (the default) picks the measured winner: scan-stacked
    for narrow conditioners, unrolled for hidden>=512 (BASELINE.md
    stacked-vs-unrolled crossover)."""
    kw = dict(features=6, num_layers=2, num_blocks_per_layer=1, num_bins=4,
              key=jax.random.key(0), rng=np.random.default_rng(0))
    narrow = NeuralSplineFlow(hidden_features=64, **kw)
    assert isinstance(narrow.transform, StackedTransform)
    wide = NeuralSplineFlow(hidden_features=512, **kw)
    assert isinstance(wide.transform, CompositeTransform)
    # odd d + reverse permutations can't stack -> auto falls back, no raise
    odd = NeuralSplineFlow(features=5, hidden_features=64, num_layers=2,
                           use_random_permutations=False,
                           key=jax.random.key(0))
    assert isinstance(odd.transform, CompositeTransform)
    # explicit override always wins
    forced = NeuralSplineFlow(hidden_features=512, stacked=True, **kw)
    assert isinstance(forced.transform, StackedTransform)
