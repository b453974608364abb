"""Shape/tensor helpers (reference: nflows/utils/torchutils.py:8-171).

All functions are pure, jit-safe (static shape arithmetic only), and written
against ``jax.numpy``.
"""

from __future__ import annotations

import jax.numpy as jnp

from nflows_tpu.utils import typechecks as check

__all__ = [
    "tile",
    "sum_except_batch",
    "split_leading_dim",
    "merge_leading_dims",
    "repeat_rows",
    "tensor_to_np",
    "get_temperature",
]


def tile(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Each element of flattened ``x`` repeated n times contiguously:
    [a, b] -> [a, a, b, b] (reference torchutils.py:8-16)."""
    if not check.is_positive_int(n):
        raise TypeError("Argument 'n' must be a positive integer.")
    x_ = x.reshape(-1)
    x_ = jnp.broadcast_to(x_[:, None], (x_.shape[0], n))
    return x_.reshape(-1)


def sum_except_batch(x: jnp.ndarray, num_batch_dims: int = 1) -> jnp.ndarray:
    """Sum all but the first ``num_batch_dims`` dims (torchutils.py:17-30)."""
    if not check.is_nonnegative_int(num_batch_dims):
        raise TypeError("Number of batch dimensions must be a non-negative integer.")
    reduce_dims = tuple(range(num_batch_dims, x.ndim))
    return jnp.sum(x, axis=reduce_dims)


def split_leading_dim(x: jnp.ndarray, shape) -> jnp.ndarray:
    """Reshape the leading dim into the given (possibly -1) shape (torchutils.py:33-37)."""
    new_shape = tuple(shape) + x.shape[1:]
    return x.reshape(new_shape)


def merge_leading_dims(x: jnp.ndarray, num_dims: int) -> jnp.ndarray:
    """Flatten the first ``num_dims`` dims into one (torchutils.py:40-46)."""
    if not check.is_positive_int(num_dims):
        raise TypeError("Number of leading dims must be a positive integer.")
    if num_dims > x.ndim:
        raise ValueError("Number of leading dims can't be greater than total dims.")
    new_shape = (-1,) + x.shape[num_dims:]
    return x.reshape(new_shape)


def repeat_rows(x: jnp.ndarray, num_reps: int) -> jnp.ndarray:
    """Each row of ``x`` repeated ``num_reps`` times contiguously (torchutils.py:49-56).

    [a, b] -> [a, a, ..., b, b, ...]  (unlike ``tile`` which interleaves).
    """
    if not check.is_positive_int(num_reps):
        raise TypeError("Number of repetitions must be a positive integer.")
    shape = x.shape
    x = x[:, None, ...]
    x = jnp.broadcast_to(x, (shape[0], num_reps) + shape[1:])
    return merge_leading_dims(x, num_dims=2)


def tensor_to_np(x) -> "object":
    import numpy as np

    return np.asarray(x)


def get_temperature(max_value, bound: float = 1 - 1e-3):
    """Temperature mapping max_value into (0, bound) sigmoid range (torchutils.py:150-160)."""
    import numpy as np

    max_value = jnp.asarray(max_value)
    bound_ = jnp.asarray(bound, dtype=max_value.dtype)
    # reference clamps to 1 (torchutils.py:155-159)
    return jnp.minimum(jnp.log(bound_ / (1 - bound_)) / max_value, 1.0)
