"""Transform protocol and combinators (reference: nflows/transforms/base.py).

A ``Transform`` is an immutable pytree :class:`~nflows_tpu.core.module.Module`
exposing two pure methods::

    forward(inputs, context=None) -> (outputs, logabsdet)   # x -> y
    inverse(inputs, context=None) -> (outputs, logabsdet)   # y -> x

with ``logabsdet`` shaped ``[batch]`` — the framework-wide invariant
(reference nflows/transforms/base.py:44-52). Composition is a running sum of
logabsdet. Because every transform is a pytree, a whole chain jits as a single
XLA program: the Python loop in :class:`CompositeTransform` unrolls at trace
time and XLA fuses across layer boundaries.

Unlike the reference, no exceptions are raised *inside* traced code — domain
violations surface as NaNs (documented per-transform) or can be caught
eagerly with ``nflows_tpu.utils`` validation helpers. ``InverseNotAvailable``
and ``InputOutsideDomain`` are still raised at the Python level for API
parity wherever the condition is knowable before tracing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from nflows_tpu.core.module import Module, static
import nflows_tpu.utils.typechecks as check

__all__ = [
    "InverseNotAvailable",
    "InputOutsideDomain",
    "Transform",
    "CompositeTransform",
    "MultiscaleCompositeTransform",
    "InverseTransform",
]

Array = jnp.ndarray


class InverseNotAvailable(Exception):
    """Thrown when a transform does not have an inverse."""


class InputOutsideDomain(Exception):
    """Thrown when the input to a transform is outside its domain."""


class Transform(Module):
    """Base class for all transform objects."""

    def __call__(self, inputs: Array, context: Optional[Array] = None):
        return self.forward(inputs, context)

    def forward(self, inputs: Array, context: Optional[Array] = None) -> Tuple[Array, Array]:
        raise NotImplementedError()

    def inverse(self, inputs: Array, context: Optional[Array] = None) -> Tuple[Array, Array]:
        raise InverseNotAvailable()

    def initialize_with_data(self, inputs: Array, context: Optional[Array] = None):
        """Explicit data-dependent initialization / statistics pass.

        Returns ``(new_transform, outputs)``. The reference mutates state
        lazily inside forward (ActNorm init, normalization.py:175-218;
        BatchNorm running stats, normalization.py:104-107); in JAX state is
        immutable, so stateful transforms override this and the training
        loop calls it explicitly (see nflows_tpu.training). The default is
        a no-op pass-through.
        """
        outputs, _ = self.forward(inputs, context)
        return self, outputs


class CompositeTransform(Transform):
    """Composes several transforms into one, in the order given
    (reference nflows/transforms/base.py:32-60)."""

    transforms: tuple

    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = tuple(transforms)

    @staticmethod
    def _cascade(inputs, funcs, context):
        batch_size = inputs.shape[0]
        outputs = inputs
        total_logabsdet = jnp.zeros(batch_size, dtype=inputs.dtype)
        for func in funcs:
            outputs, logabsdet = func(outputs, context)
            total_logabsdet = total_logabsdet + logabsdet
        return outputs, total_logabsdet

    def forward(self, inputs, context=None):
        funcs = tuple(t.forward for t in self.transforms)
        return self._cascade(inputs, funcs, context)

    def inverse(self, inputs, context=None):
        funcs = tuple(t.inverse for t in self.transforms[::-1])
        return self._cascade(inputs, funcs, context)

    def initialize_with_data(self, inputs, context=None):
        new_transforms = []
        outputs = inputs
        for t in self.transforms:
            t_new, outputs = t.initialize_with_data(outputs, context)
            new_transforms.append(t_new)
        return self.replace(transforms=tuple(new_transforms)), outputs


class MultiscaleCompositeTransform(Transform):
    """RealNVP multiscale: after each transform (except the last), split off
    half the channels into the output and keep transforming the rest
    (reference nflows/transforms/base.py:63-212). Outputs are flattened.

    Built functionally: pass all transforms + their output shapes to the
    constructor (the reference's stateful ``add_transform`` protocol is kept
    as a classmethod builder ``MultiscaleCompositeTransform.builder``).
    All shape bookkeeping is static, resolved at trace time.
    """

    transforms: tuple
    output_shapes: tuple = static()
    split_dim: int = static()

    def __init__(self, transforms, output_shapes, split_dim: int = 1):
        if not check.is_positive_int(split_dim):
            raise TypeError("Split dimension must be a positive integer.")
        if len(transforms) != len(output_shapes):
            raise ValueError("Need one output shape per transform.")
        for shape in output_shapes:
            if (split_dim - 1) >= len(shape):
                raise ValueError("No split_dim in output shape")
        self.transforms = tuple(transforms)
        self.output_shapes = tuple(tuple(s) for s in output_shapes)
        self.split_dim = split_dim

    @classmethod
    def builder(cls, num_transforms: int, split_dim: int = 1):
        """Incremental builder mirroring the reference's add_transform protocol.

        Usage::

            b = MultiscaleCompositeTransform.builder(num_transforms=3)
            next_shape = b.add_transform(t1, shape1)
            ...
            mct = b.build()
        """
        return _MultiscaleBuilder(num_transforms, split_dim)

    def forward(self, inputs, context=None):
        if self.split_dim >= inputs.ndim:
            raise ValueError("No split_dim in inputs.")
        batch_size = inputs.shape[0]
        dim = self.split_dim

        all_outputs = []
        total_logabsdet = jnp.zeros(batch_size, dtype=inputs.dtype)
        hiddens = inputs
        for i, transform in enumerate(self.transforms[:-1]):
            transform_outputs, logabsdet = transform.forward(hiddens, context)
            n = transform_outputs.shape[dim]
            # torch.chunk(x, 2): first chunk gets ceil(n/2)
            first = (n + 1) // 2
            outputs = jnp.take(transform_outputs, np.arange(first), axis=dim)
            hiddens = jnp.take(transform_outputs, np.arange(first, n), axis=dim)
            assert outputs.shape[1:] == self.output_shapes[i]
            all_outputs.append(outputs.reshape(batch_size, -1))
            total_logabsdet = total_logabsdet + logabsdet
        outputs, logabsdet = self.transforms[-1].forward(hiddens, context)
        all_outputs.append(outputs.reshape(batch_size, -1))
        total_logabsdet = total_logabsdet + logabsdet
        return jnp.concatenate(all_outputs, axis=-1), total_logabsdet

    def inverse(self, inputs, context=None):
        if inputs.ndim != 2:
            raise ValueError("Expecting NxD inputs")
        batch_size = inputs.shape[0]
        dim = self.split_dim

        rev_inv_transforms = [t.inverse for t in self.transforms[::-1]]

        split_indices = np.cumsum([int(np.prod(s)) for s in self.output_shapes])
        split_indices = np.insert(split_indices, 0, 0)

        split_inputs = []
        for i in range(len(self.output_shapes)):
            flat = inputs[:, split_indices[i]: split_indices[i + 1]]
            split_inputs.append(flat.reshape(-1, *self.output_shapes[i]))
        rev_split_inputs = split_inputs[::-1]

        total_logabsdet = jnp.zeros(batch_size, dtype=inputs.dtype)
        hiddens, logabsdet = rev_inv_transforms[0](rev_split_inputs[0], context)
        total_logabsdet = total_logabsdet + logabsdet

        for inv_transform, input_chunk in zip(rev_inv_transforms[1:], rev_split_inputs[1:]):
            tmp = jnp.concatenate([input_chunk, hiddens], axis=dim)
            hiddens, logabsdet = inv_transform(tmp, context)
            total_logabsdet = total_logabsdet + logabsdet

        return hiddens, total_logabsdet

    def initialize_with_data(self, inputs, context=None):
        """Thread data-dependent init through the split cascade."""
        dim = self.split_dim
        new_transforms = []
        hiddens = inputs
        for i, transform in enumerate(self.transforms[:-1]):
            t_new, transform_outputs = transform.initialize_with_data(hiddens, context)
            new_transforms.append(t_new)
            n = transform_outputs.shape[dim]
            first = (n + 1) // 2
            hiddens = jnp.take(transform_outputs, np.arange(first, n), axis=dim)
        t_new, _ = self.transforms[-1].initialize_with_data(hiddens, context)
        new_transforms.append(t_new)
        new_self = self.replace(transforms=tuple(new_transforms))
        outputs, _ = new_self.forward(inputs, context)
        return new_self, outputs


class _MultiscaleBuilder:
    def __init__(self, num_transforms, split_dim):
        if not check.is_positive_int(num_transforms):
            raise TypeError("Number of transforms must be a positive integer.")
        if not check.is_positive_int(split_dim):
            raise TypeError("Split dimension must be a positive integer.")
        self._num_transforms = num_transforms
        self._split_dim = split_dim
        self._transforms = []
        self._output_shapes = []

    def add_transform(self, transform, transform_output_shape):
        if len(self._transforms) == self._num_transforms:
            raise RuntimeError(
                f"Adding more than {self._num_transforms} transforms is not allowed."
            )
        if (self._split_dim - 1) >= len(transform_output_shape):
            raise ValueError("No split_dim in output shape")
        if transform_output_shape[self._split_dim - 1] < 2:
            raise ValueError(
                f"Size of dimension {self._split_dim} must be at least 2."
            )
        self._transforms.append(transform)
        if len(self._transforms) != self._num_transforms:
            output_shape = list(transform_output_shape)
            output_shape[self._split_dim - 1] = (output_shape[self._split_dim - 1] + 1) // 2
            output_shape = tuple(output_shape)
            hidden_shape = list(transform_output_shape)
            hidden_shape[self._split_dim - 1] = hidden_shape[self._split_dim - 1] // 2
            hidden_shape = tuple(hidden_shape)
        else:
            output_shape = tuple(transform_output_shape)
            hidden_shape = None
        self._output_shapes.append(output_shape)
        return hidden_shape

    def build(self) -> MultiscaleCompositeTransform:
        if len(self._transforms) != self._num_transforms:
            raise RuntimeError(
                f"Expecting exactly {self._num_transforms} transform(s) to be added."
            )
        return MultiscaleCompositeTransform(
            self._transforms, self._output_shapes, self._split_dim
        )


class InverseTransform(Transform):
    """Swaps forward and inverse (reference nflows/transforms/base.py:215-231)."""

    transform: Transform

    def __init__(self, transform: Transform):
        self.transform = transform

    def forward(self, inputs, context=None):
        return self.transform.inverse(inputs, context)

    def inverse(self, inputs, context=None):
        return self.transform.forward(inputs, context)
