"""BatchNorm/ActNorm + multiscale composite tests
(reference: tests/transforms/normalization_test.py, base_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.core.module import set_training
from nflows_tpu.transforms.base import (
    CompositeTransform,
    InverseNotAvailable,
    MultiscaleCompositeTransform,
)
from nflows_tpu.transforms.coupling import AffineCouplingTransform
from nflows_tpu.transforms.normalization import ActNorm, BatchNorm
from nflows_tpu.transforms.standard import IdentityTransform
from nflows_tpu.nn.nets import ResidualNet
from nflows_tpu.utils import masks as maskutils
from tests.harness import assert_tensor_is_good

BATCH, DIM = 50, 5


class TestBatchNorm:
    def test_train_forward_normalizes(self):
        bn = BatchNorm(DIM)
        x = 3 + 2 * jax.random.normal(jax.random.key(0), (BATCH, DIM))
        y, lad = bn.forward(x)
        assert_tensor_is_good(y, (BATCH, DIM))
        assert_tensor_is_good(lad, (BATCH,))
        # batch-stat normalization: near zero mean (weight≈1, bias=0 at init)
        np.testing.assert_allclose(np.asarray(y.mean(0)), 0.0, atol=1e-4)

    def test_train_inverse_raises(self):
        bn = BatchNorm(DIM)
        with pytest.raises(InverseNotAvailable):
            bn.inverse(jnp.ones((BATCH, DIM)))

    def test_eval_roundtrip_after_stats(self):
        bn = BatchNorm(DIM, momentum=1.0)  # one-shot stats absorption
        x = 3 + 2 * jax.random.normal(jax.random.key(0), (BATCH, DIM))
        bn, _ = bn.initialize_with_data(x)
        bn_eval = set_training(bn, False)
        y, lad = bn_eval.forward(x)
        x_rec, lad_inv = bn_eval.inverse(y)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)
        np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-3)

    def test_running_stats_ema(self):
        bn = BatchNorm(DIM, momentum=0.1)
        x = jnp.ones((BATCH, DIM))
        bn2 = bn.update_running_stats(x)
        np.testing.assert_allclose(np.asarray(bn2.running_mean), 0.1, atol=1e-6)


class TestActNorm:
    def test_uninitialized_is_identity(self):
        an = ActNorm(DIM)
        x = jax.random.normal(jax.random.key(0), (BATCH, DIM))
        y, lad = an.forward(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))
        np.testing.assert_allclose(np.asarray(lad), 0.0)

    def test_data_dependent_init(self):
        an = ActNorm(DIM)
        x = 5 + 3 * jax.random.normal(jax.random.key(0), (BATCH, DIM))
        an, y = an.initialize_with_data(x)
        assert an.initialized
        # post-init activations: zero mean, unit variance
        np.testing.assert_allclose(np.asarray(y.mean(0)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y.std(0, ddof=1)), 1.0, atol=1e-3)
        # idempotent
        an2, _ = an.initialize_with_data(2 * x)
        np.testing.assert_allclose(np.asarray(an2.log_scale), np.asarray(an.log_scale))

    def test_roundtrip(self):
        an = ActNorm(DIM)
        x = jax.random.normal(jax.random.key(0), (BATCH, DIM))
        an, _ = an.initialize_with_data(x)
        y, lad = an.forward(x)
        x_rec, lad_inv = an.inverse(y)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-5)

    def test_image_shape(self):
        an = ActNorm(3)
        x = jax.random.normal(jax.random.key(0), (BATCH, 3, 4, 4))
        an, y = an.initialize_with_data(x)
        assert y.shape == x.shape
        y2, lad = an.forward(x)
        x_rec, _ = an.inverse(y2)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)


class TestMultiscale:
    def _coupling(self, features):
        mask = maskutils.create_alternating_binary_mask(features)
        return AffineCouplingTransform(
            mask, lambda i, o: ResidualNet(i, o, hidden_features=16,
                                           key=jax.random.key(features)))

    def test_build_and_roundtrip(self):
        b = MultiscaleCompositeTransform.builder(num_transforms=3)
        shape = (8,)
        for _ in range(2):
            next_shape = b.add_transform(self._coupling(shape[0]), shape)
            shape = next_shape
        b.add_transform(self._coupling(shape[0]), shape)
        mct = b.build()

        x = jax.random.normal(jax.random.key(0), (BATCH, 8))
        y, lad = mct.forward(x)
        assert_tensor_is_good(y, (BATCH, 8))
        assert_tensor_is_good(lad, (BATCH,))
        x_rec, lad_inv = mct.inverse(y)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-4)

    def test_output_is_flat_concat(self):
        b = MultiscaleCompositeTransform.builder(num_transforms=2)
        shape = b.add_transform(IdentityTransform(), (8,))
        b.add_transform(IdentityTransform(), shape)
        mct = b.build()
        x = jax.random.normal(jax.random.key(0), (BATCH, 8))
        y, lad = mct.forward(x)
        # identities: multiscale of identity == identity (up to split order)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(lad), 0.0)


def test_composite_initialize_with_data_threads_chain():
    chain = CompositeTransform([
        ActNorm(DIM), BatchNorm(DIM, momentum=1.0), ActNorm(DIM),
    ])
    x = 4 + 2 * jax.random.normal(jax.random.key(0), (BATCH, DIM))
    new_chain, out = chain.initialize_with_data(x)
    assert new_chain.transforms[0].initialized
    assert new_chain.transforms[2].initialized
    assert not bool(jnp.any(jnp.isnan(out)))
    # running stats were absorbed
    assert float(jnp.abs(new_chain.transforms[1].running_mean).sum()) > 0


def test_squeeze_factor3_roundtrip():
    """Regression: inverse hardcoded the factor-2 channel check and rejected
    (or miscomputed) other factors."""
    import jax.numpy as jnp
    import numpy as np

    from nflows_tpu.transforms import SqueezeTransform

    t = SqueezeTransform(factor=3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 6, 6)),
                    dtype=jnp.float32)
    y, lad = t.forward(x)
    assert y.shape == (2, 9, 2, 2)
    x2, _ = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
