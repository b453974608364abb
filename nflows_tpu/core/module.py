"""Pytree module system — the foundation of nflows_tpu.

Every transform, distribution, network and flow in this framework is a
``Module``: an immutable pytree whose array leaves are parameters (or
non-trainable buffers) and whose non-array configuration lives in the pytree
aux-data. This gives torch-``nn.Module``-like ergonomics (``flow.log_prob(x)``)
while staying fully functional: a ``Module`` can be passed straight through
``jax.jit`` / ``jax.grad`` / ``jax.vmap`` / ``pjit``, and "mutation"
(e.g. ActNorm data-dependent init, BatchNorm running stats) is expressed as
``module.replace(...)`` returning a new instance.

Field kinds, declared in the class body:

- plain annotated field            -> pytree child, trainable parameter leaf
- ``buffer()``                     -> pytree child, NON-trainable (masks,
                                      permutation indices, running stats)
- ``static()``                     -> aux-data (ints, strings, callables);
                                      changing it triggers re-compilation

``partition(module)`` splits a module into (trainable, rest) pytrees with
``None`` placeholders, and ``combine`` merges them back — the standard
equinox-style pattern for feeding only trainable leaves to ``jax.grad`` /
optax while buffers and statics ride along untouched.

Design rationale vs the reference (bayesiains/nflows): the reference uses
stateful ``torch.nn.Module`` with registered buffers (e.g.
nflows/transforms/coupling.py:44-49); here state is explicit and immutable so
that everything composes with XLA's trace-once compilation model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "Module",
    "static",
    "buffer",
    "field",
    "partition",
    "combine",
    "set_training",
    "is_trainable_leaf",
]


class _FieldSpec:
    """Sentinel placed as a class-body default to mark field kind."""

    __slots__ = ("kind", "default", "has_default")

    def __init__(self, kind: str, default: Any = dataclasses.MISSING):
        self.kind = kind
        self.default = default
        self.has_default = default is not dataclasses.MISSING


def static(default: Any = dataclasses.MISSING) -> Any:
    """Mark a field as static config (goes to pytree aux-data, must be hashable)."""
    return _FieldSpec("static", default)


def buffer(default: Any = dataclasses.MISSING) -> Any:
    """Mark a field as a non-trainable array buffer (pytree child)."""
    return _FieldSpec("buffer", default)


def field(default: Any = dataclasses.MISSING) -> Any:
    """Mark a field explicitly as a trainable child (the default kind)."""
    return _FieldSpec("param", default)


class _ModuleMeta(type):
    """Collects field declarations and registers each subclass as a pytree."""

    def __new__(mcs, name, bases, namespace):
        cls = super().__new__(mcs, name, bases, namespace)

        # Inherit field kinds/defaults from bases (MRO order, base-first),
        # then apply this class's own annotations + sentinels on top.
        defaults: Dict[str, Any] = {}
        seen: Dict[str, str] = {}
        for klass in reversed(cls.__mro__[1:]):
            seen.update(getattr(klass, "_field_kinds", {}))
            defaults.update(getattr(klass, "_field_defaults", {}))
        for fname in namespace.get("__annotations__", {}):
            if fname.startswith("_"):
                continue
            spec = namespace.get(fname, None)
            if isinstance(spec, _FieldSpec):
                kind = spec.kind
                if spec.has_default:
                    defaults[fname] = spec.default
                # Remove the sentinel so it is never read as a value.
                if cls.__dict__.get(fname) is spec:
                    delattr(cls, fname)
            elif fname in seen:
                kind = seen[fname]  # re-annotation keeps inherited kind
            else:
                kind = "param"
                if spec is not None and not callable(spec):
                    defaults[fname] = spec
            seen[fname] = kind
        cls._field_kinds = dict(seen)

        child_fields = tuple(f for f, k in seen.items() if k in ("param", "buffer"))
        static_fields = tuple(f for f, k in seen.items() if k == "static")
        buffer_fields = frozenset(f for f, k in seen.items() if k == "buffer")

        cls._child_fields = child_fields
        cls._static_fields = static_fields
        cls._buffer_fields = buffer_fields
        cls._field_defaults = defaults

        jax.tree_util.register_pytree_with_keys(
            cls,
            flatten_with_keys=lambda m, c=cls: _flatten_with_keys(m, c),
            flatten_func=lambda m, c=cls: _flatten(m, c),
            unflatten_func=lambda aux, children, c=cls: _unflatten(c, aux, children),
        )
        return cls

    def __call__(cls, *args, **kwargs):
        obj = cls.__new__(cls)
        # defaults first, then user __init__ overrides
        for fname, val in cls._field_defaults.items():
            object.__setattr__(obj, fname, val)
        obj.__init__(*args, **kwargs)
        missing = [
            f
            for f in (*cls._child_fields, *cls._static_fields)
            if not hasattr(obj, f)
        ]
        if missing:
            raise TypeError(
                f"{cls.__name__}.__init__ did not set fields: {missing}"
            )
        object.__setattr__(obj, "_mod_frozen", True)
        return obj


def _flatten_with_keys(m, cls):
    children = tuple(
        (jax.tree_util.GetAttrKey(f), getattr(m, f)) for f in cls._child_fields
    )
    aux = tuple(getattr(m, f) for f in cls._static_fields)
    return children, aux


def _flatten(m, cls):
    children = tuple(getattr(m, f) for f in cls._child_fields)
    aux = tuple(getattr(m, f) for f in cls._static_fields)
    return children, aux


def _unflatten(cls, aux, children):
    obj = object.__new__(cls)
    for fname, val in zip(cls._child_fields, children):
        object.__setattr__(obj, fname, val)
    for fname, val in zip(cls._static_fields, aux):
        object.__setattr__(obj, fname, val)
    object.__setattr__(obj, "_mod_frozen", True)
    return obj


class Module(metaclass=_ModuleMeta):
    """Base class for all nflows_tpu components. Immutable pytree."""

    def __setattr__(self, name, value):
        if getattr(self, "_mod_frozen", False):
            raise dataclasses.FrozenInstanceError(
                f"{type(self).__name__} is immutable; use .replace({name}=...)"
            )
        object.__setattr__(self, name, value)

    def replace(self, **updates) -> "Module":
        """Functional update: return a copy with the given fields replaced."""
        cls = type(self)
        valid = set(cls._child_fields) | set(cls._static_fields)
        bad = set(updates) - valid
        if bad:
            raise ValueError(f"{cls.__name__} has no fields {sorted(bad)}")
        obj = object.__new__(cls)
        for f in (*cls._child_fields, *cls._static_fields):
            object.__setattr__(obj, f, updates.get(f, getattr(self, f)))
        object.__setattr__(obj, "_mod_frozen", True)
        return obj

    def __repr__(self):
        cls = type(self)
        parts = []
        for f in cls._child_fields:
            v = getattr(self, f)
            if isinstance(v, (jnp.ndarray, jax.Array)):
                parts.append(f"{f}=Array{tuple(v.shape)}")
            else:
                parts.append(f"{f}={v!r}")
        for f in cls._static_fields:
            parts.append(f"{f}={getattr(self, f)!r}")
        inner = ", ".join(parts)
        if len(inner) > 200:
            inner = inner[:200] + "..."
        return f"{cls.__name__}({inner})"

    # -- convenience ------------------------------------------------------

    def num_parameters(self) -> int:
        """Total trainable parameter count (reference: utils/torchutils.py:139-146)."""
        params, _ = partition(self)
        return sum(
            x.size for x in jax.tree_util.tree_leaves(params) if x is not None
        )


def is_trainable_leaf(x: Any) -> bool:
    """A leaf is trainable iff it is an inexact (floating/complex) array."""
    return isinstance(x, (jnp.ndarray, jax.Array)) and jnp.issubdtype(
        jnp.asarray(x).dtype, jnp.inexact
    )


def _split(x: Any, take_params: bool) -> Any:
    if isinstance(x, Module):
        cls = type(x)
        obj = object.__new__(cls)
        for f in cls._child_fields:
            v = getattr(x, f)
            if f in cls._buffer_fields:
                object.__setattr__(obj, f, None if take_params else v)
            else:
                object.__setattr__(obj, f, _split(v, take_params))
        for f in cls._static_fields:
            object.__setattr__(obj, f, getattr(x, f))
        object.__setattr__(obj, "_mod_frozen", True)
        return obj
    elif isinstance(x, (tuple, list)):
        items = [_split(v, take_params) for v in x]
        # NamedTuples (e.g. optax states) need positional construction
        if hasattr(type(x), "_fields"):
            return type(x)(*items)
        return type(x)(items)
    elif isinstance(x, dict):
        return {k: _split(v, take_params) for k, v in x.items()}
    elif x is None:
        return None
    else:
        trainable = is_trainable_leaf(x)
        if take_params:
            return x if trainable else None
        return None if trainable else x


def partition(module: Any) -> Tuple[Any, Any]:
    """Split into (trainable_params, rest) pytrees with None placeholders.

    ``rest`` carries buffers, integer arrays, and anything non-trainable;
    statics live in both treedefs. Recombine with :func:`combine`.
    """
    return _split(module, True), _split(module, False)


def set_training(tree: Any, mode: bool) -> Any:
    """Return a copy of the pytree with every Module's ``training`` static
    field set to ``mode`` (the analogue of torch's .train()/.eval())."""

    def walk(x):
        if isinstance(x, Module):
            updates = {f: walk(getattr(x, f)) for f in type(x)._child_fields}
            if "training" in type(x)._static_fields:
                updates["training"] = mode
            return x.replace(**updates)
        if isinstance(x, (tuple, list)):
            items = [walk(v) for v in x]
            if hasattr(type(x), "_fields"):  # NamedTuple (optax states)
                return type(x)(*items)
            return type(x)(items)
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items()}
        return x

    return walk(tree)


def combine(params: Any, rest: Any) -> Any:
    """Inverse of :func:`partition`."""
    return jax.tree_util.tree_map(
        lambda a, b: b if a is None else a,
        params,
        rest,
        is_leaf=lambda x: x is None,
    )
