"""MADE structural tests (reference: tests/transforms/made_test.py).

The two strongest checks in the reference suite:
1. jacobian connectivity — ∂output_k/∂input_{>=k} must be exactly 0
   (made_test.py:77-107), done here with jax.jacrev.
2. total-mask algebra — the product of all layer masks must be strictly
   lower-triangular in degree order (made_test.py:109-136).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nflows_tpu.nn.made import MADE, MaskedDense, _get_input_degrees


class TestMaskedDense:
    def test_hidden_mask(self):
        features, out = 5, 8
        layer = MaskedDense(
            in_degrees=_get_input_degrees(features),
            out_features=out,
            autoregressive_features=features,
            random_mask=False,
            is_output=False,
            key=jax.random.key(0),
        )
        mask = np.asarray(layer.mask)  # [in, out]
        degrees = np.asarray(layer.degrees)
        in_deg = _get_input_degrees(features)
        expected = (degrees[None, :] >= in_deg[:, None]).astype(np.float32)
        np.testing.assert_array_equal(mask, expected)

    def test_output_mask_strict(self):
        features, mult = 5, 3
        layer = MaskedDense(
            in_degrees=_get_input_degrees(features),
            out_features=features * mult,
            autoregressive_features=features,
            random_mask=False,
            is_output=True,
            key=jax.random.key(0),
        )
        mask = np.asarray(layer.mask)
        degrees = np.asarray(layer.degrees)
        in_deg = _get_input_degrees(features)
        expected = (degrees[None, :] > in_deg[:, None]).astype(np.float32)
        np.testing.assert_array_equal(mask, expected)
        # output degrees repeat each of 1..D `mult` times contiguously
        np.testing.assert_array_equal(degrees, np.repeat(in_deg, mult))


@pytest.mark.parametrize("use_residual_blocks,random_mask",
                         [(False, False), (False, True), (True, False)])
def test_shapes(use_residual_blocks, random_mask):
    features, hidden, mult, batch = 10, 30, 4, 16
    model = MADE(
        features=features, hidden_features=hidden, output_multiplier=mult,
        use_residual_blocks=use_residual_blocks, random_mask=random_mask,
        key=jax.random.key(0),
    )
    x = jax.random.normal(jax.random.key(1), (batch, features))
    y = model(x)
    assert y.shape == (batch, features * mult)


@pytest.mark.parametrize("use_residual_blocks,random_mask",
                         [(False, False), (False, True), (True, False)])
def test_autoregressive_jacobian(use_residual_blocks, random_mask):
    """∂out[k*mult + j]/∂in[>=k] == 0 (reference made_test.py:77-107)."""
    features, hidden, mult = 6, 16, 2
    model = MADE(
        features=features, hidden_features=hidden, output_multiplier=mult,
        use_residual_blocks=use_residual_blocks, random_mask=random_mask,
        key=jax.random.key(0),
    )
    x = jax.random.normal(jax.random.key(1), (1, features))
    jac = jax.jacrev(lambda z: model(z)[0])(x)[:, 0, :]  # [out, in]
    # output j belongs to feature j // mult (contiguous-repeat degree layout)
    jac = np.asarray(jac).reshape(features, mult, features)
    for k in range(features):
        for j in range(mult):
            assert np.all(jac[k, j, k:] == 0.0), f"output {k} depends on inputs >= {k}"


@pytest.mark.parametrize("use_residual_blocks,random_mask",
                         [(False, False), (False, True), (True, False)])
def test_total_mask_lower_triangular(use_residual_blocks, random_mask):
    """Product of all masks is strictly lower triangular
    (reference made_test.py:109-136)."""
    features, hidden = 6, 16
    model = MADE(
        features=features, hidden_features=hidden, output_multiplier=1,
        use_residual_blocks=use_residual_blocks, random_mask=random_mask,
        key=jax.random.key(0),
    )
    # Collect masks in forward order; [in, out] layout means the product is
    # mask_0 @ mask_1 @ ... giving total [in, out] connectivity.
    masks = [np.asarray(model.initial_layer.mask)]
    for block in model.blocks:
        if use_residual_blocks:
            masks.extend([np.asarray(block.linear_0.mask), np.asarray(block.linear_1.mask)])
        else:
            masks.append(np.asarray(block.linear.mask))
    masks.append(np.asarray(model.final_layer.mask))
    total = masks[0]
    for m in masks[1:]:
        total = total @ m
    # total[i, k] != 0 only if input i feeds output k; need strict i < k.
    for i in range(features):
        assert np.all(total[i, : i + 1] == 0.0)


def test_conditional_shapes():
    features, hidden, context, batch = 10, 32, 5, 16
    model = MADE(
        features=features, hidden_features=hidden, context_features=context,
        key=jax.random.key(0),
    )
    x = jax.random.normal(jax.random.key(1), (batch, features))
    c = jax.random.normal(jax.random.key(2), (batch, context))
    y = model(x, c)
    assert y.shape == (batch, features)


@pytest.mark.parametrize("use_residual_blocks", [False, True])
def test_batch_norm_blocks(use_residual_blocks):
    """use_batch_norm=True inside MADE blocks (reference made.py:90-160):
    finite outputs, gradients flow into the scale/offset params, and the
    per-sample autoregressive property survives (batch norm normalizes each
    hidden unit over the batch axis — it never mixes units, so degree
    connectivity is preserved)."""
    features, hidden, batch = 5, 12, 8
    model = MADE(
        features=features, hidden_features=hidden,
        use_residual_blocks=use_residual_blocks, use_batch_norm=True,
        key=jax.random.key(0),
    )
    blk = model.blocks[0]
    if use_residual_blocks:
        assert blk.batch_norm_0 is not None and blk.batch_norm_1 is not None
    else:
        assert blk.batch_norm is not None

    x = jax.random.normal(jax.random.key(1), (batch, features))
    y = model(x)
    assert y.shape == (batch, features)
    assert np.all(np.isfinite(np.asarray(y)))

    grads = jax.grad(lambda m: jnp.sum(m(x) ** 2))(model)
    gleaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in gleaves)
    gblk = grads.blocks[0]
    bn = gblk.batch_norm_0 if use_residual_blocks else gblk.batch_norm
    assert float(jnp.sum(jnp.abs(bn.scale))) > 0.0

    # same-sample strict autoregressive property under batch statistics:
    # out[i, k] must not depend on in[i, k:]
    jac = jax.jacrev(model)(x)          # [batch, out, batch, in]
    jac = np.asarray(jac)
    for i in range(batch):
        for k in range(features):
            assert np.all(jac[i, k, i, k:] == 0.0)


def test_batch_norm_affine_ar_transform_trains():
    """The VERDICT round-2 gap: MaskedAffineAutoregressiveTransform(
    use_batch_norm=True) must construct and train."""
    from nflows_tpu.transforms.autoregressive import (
        MaskedAffineAutoregressiveTransform,
    )

    t = MaskedAffineAutoregressiveTransform(
        features=4, hidden_features=16, use_batch_norm=True,
        key=jax.random.key(0),
    )
    x = jax.random.normal(jax.random.key(1), (32, 4))

    def loss(t):
        y, lad = t.forward(x)
        return jnp.mean(y ** 2) - jnp.mean(lad)

    val, grads = jax.value_and_grad(loss)(t)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
