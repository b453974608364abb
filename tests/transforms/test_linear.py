

def test_precompute_linear_caches_walks_flow():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nflows_tpu.models import GlowFlow
    from nflows_tpu.transforms import precompute_linear_caches
    from nflows_tpu.transforms.linear import Linear

    flow = GlowFlow((3, 8, 8), num_levels=1, steps_per_level=2,
                    hidden_channels=8, coupling="affine",
                    key=jax.random.key(0), rng=np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3, 8, 8)),
                    dtype=jnp.float32)
    flow = flow.initialize_actnorms(x)
    flow_pre = precompute_linear_caches(flow)

    # every Linear in the tree is now cached
    found = []
    def walk(m):
        from nflows_tpu.core.module import Module
        if isinstance(m, Linear):
            found.append(m)
        if isinstance(m, Module):
            for f in type(m)._child_fields:
                walk(getattr(m, f))
        elif isinstance(m, (tuple, list)):
            for v in m:
                walk(v)
    walk(flow_pre)
    assert found and all(t.using_cache and t.cache_inverse is not None
                         for t in found)

    # identical numerics both directions
    lp0, lp1 = flow.log_prob(x), flow_pre.log_prob(x)
    np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1), atol=1e-4)
    s0 = flow._sample(jax.random.key(2), 4, None)
    s1 = flow_pre._sample(jax.random.key(2), 4, None)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-4)
