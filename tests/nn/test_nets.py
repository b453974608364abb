

def test_conv2d_tuple_padding():
    """Regression: torch-style (ph, pw) padding crashed in lax conv."""
    import jax
    import jax.numpy as jnp

    from nflows_tpu.nn.primitives import Conv2d

    conv = Conv2d(3, 4, kernel_size=3, padding=(1, 1), key=jax.random.key(0))
    y = conv(jnp.zeros((2, 3, 8, 8)))
    assert y.shape == (2, 4, 8, 8)
