"""Import reference (bayesiains/nflows, PyTorch) weights into nflows_tpu.

``from_torch(ours, ref)`` walks the two models in parallel — our immutable
Module pytree and the reference's ``torch.nn.Module`` tree — and returns a
copy of ours carrying the reference's trained parameters and buffers. Build
``ours`` with the same architecture hyperparameters as ``ref`` (layer
counts, hidden sizes, masks, bins); shapes are checked at every leaf.

Most of our field names deliberately mirror the reference's attribute names
(e.g. LULinear.lower_entries, ActNorm.log_scale, MADE.initial_layer), so
the default rule is: recurse into same-named attributes and copy arrays
verbatim. The exceptions are encoded explicitly below:

- torch ``nn.Linear`` stores weight ``[out, in]``; our Dense/MaskedDense is
  ``[in, out]`` → transpose. Conv2d is OIHW in both → verbatim.
- containers: our tuples vs torch ``ModuleList``; reference uses private
  names (``Flow._transform``, ``CompositeTransform._transforms``,
  ``Permutation._permutation``, ``MLP._input_layer`` ...).
- residual blocks: reference packs the two linears in ``linear_layers`` /
  ``conv_layers``; ours names them ``linear_0``/``linear_1`` (``conv_*``).
- static state: ActNorm's ``initialized`` flag is a torch buffer but a
  static (retrace-triggering) field here.

Typical migration::

    ref = <trained bayesiains/nflows Flow>            # torch
    ours = SimpleRealNVP(...same hyperparams...)      # nflows_tpu, fresh init
    ours = from_torch(ours, ref)                      # trained weights
    log_prob = jax.jit(lambda f, x: f.log_prob(x))(ours, x)

Requires torch only at call time (no import cost otherwise).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nflows_tpu.core.module import Module

__all__ = ["from_torch"]


def _np(t):
    return t.detach().cpu().numpy()


def _copy_array(ours, ref_tensor, transpose=False, what=""):
    arr = _np(ref_tensor)
    if transpose:
        arr = np.ascontiguousarray(arr.T)
    if tuple(arr.shape) != tuple(np.shape(ours)):
        raise ValueError(
            f"shape mismatch importing {what}: ours {np.shape(ours)} "
            f"vs reference {arr.shape} — architectures must match"
        )
    return jnp.asarray(arr, dtype=jnp.asarray(ours).dtype)


def _import_dense(ours, ref):
    """torch nn.Linear -> Dense/MaskedDense ([out,in] -> [in,out])."""
    updates = {"weight": _copy_array(ours.weight, ref.weight, transpose=True,
                                     what="Linear.weight")}
    if (ours.bias is None) != (getattr(ref, "bias", None) is None):
        raise ValueError(
            "bias presence mismatch importing Linear: "
            f"ours {'has' if ours.bias is not None else 'lacks'} a bias, "
            f"reference {'has' if getattr(ref, 'bias', None) is not None else 'lacks'} one"
        )
    if ours.bias is not None:
        updates["bias"] = _copy_array(ours.bias, ref.bias, what="Linear.bias")
    if hasattr(ours, "mask"):  # MaskedDense: degree algebra must agree
        ref_mask = _np(ref.mask).T
        if not np.array_equal(np.asarray(ours.mask), ref_mask):
            raise ValueError("MaskedDense mask differs from reference "
                             "MaskedLinear mask — check MADE hyperparameters")
    return ours.replace(**updates)


def _import_conv(ours, ref):
    """torch nn.Conv2d -> Conv2d (both OIHW)."""
    updates = {"weight": _copy_array(ours.weight, ref.weight, what="Conv2d.weight")}
    if ours.bias is not None:
        updates["bias"] = _copy_array(ours.bias, ref.bias, what="Conv2d.bias")
    return ours.replace(**updates)


def _import_batch_norms(updates, ours, ref):
    """Residual-block batch norm: reference nn.BatchNorm1d/2d weight/bias ->
    _BatchScale scale/offset (+ eps). Note the semantic caveat: our blocks
    always normalize with batch statistics (stateless conditioners), so an
    imported use_batch_norm model matches the reference's *train-mode*
    behavior, not its eval-mode running-stats behavior."""
    has_ours = getattr(ours, "batch_norm_0", None) is not None
    has_ref = getattr(ref, "batch_norm_layers", None) is not None
    if has_ours != has_ref:
        raise ValueError(
            "use_batch_norm mismatch importing residual block: "
            f"ours={has_ours}, reference={has_ref}"
        )
    if has_ours:
        for i in (0, 1):
            bn_ours = getattr(ours, f"batch_norm_{i}")
            bn_ref = ref.batch_norm_layers[i]
            updates[f"batch_norm_{i}"] = bn_ours.replace(
                scale=_copy_array(bn_ours.scale, bn_ref.weight,
                                  what="BatchNorm.weight"),
                offset=_copy_array(bn_ours.offset, bn_ref.bias,
                                   what="BatchNorm.bias"),
                eps=float(bn_ref.eps),
            )
    return updates


def _import_residual_block(ours, ref):
    """reference (Masked)ResidualBlock.linear_layers[i] -> linear_i."""
    updates = {
        "linear_0": _import_dense(ours.linear_0, ref.linear_layers[0]),
        "linear_1": _import_dense(ours.linear_1, ref.linear_layers[1]),
    }
    if getattr(ours, "context_layer", None) is not None:
        updates["context_layer"] = _import_dense(ours.context_layer,
                                                 ref.context_layer)
    return ours.replace(**_import_batch_norms(updates, ours, ref))


def _import_conv_residual_block(ours, ref):
    updates = {
        "conv_0": _import_conv(ours.conv_0, ref.conv_layers[0]),
        "conv_1": _import_conv(ours.conv_1, ref.conv_layers[1]),
    }
    if getattr(ours, "context_layer", None) is not None:
        updates["context_layer"] = _import_conv(ours.context_layer,
                                                ref.context_layer)
    return ours.replace(**_import_batch_norms(updates, ours, ref))


def _import_encoder(ours, ref):
    """Context encoders may be arbitrary torch modules; support the shapes
    the reference's own code/examples use (Identity, Linear, MLP, or a
    structurally matching Module)."""
    import torch

    if not isinstance(ref, torch.nn.Module):
        # reference uses a plain `lambda x: x` when no encoder was given
        # (distributions/normal.py:67) — nothing to import
        if isinstance(ours, Module):
            raise ValueError(
                "reference context encoder is a bare identity but ours is a "
                f"trainable {type(ours).__name__}"
            )
        return ours
    if isinstance(ref, torch.nn.Identity):
        if isinstance(ours, Module):
            raise ValueError(
                "reference context/embedding net is Identity but ours is a "
                f"trainable {type(ours).__name__} — its random weights would "
                "silently survive the import; construct ours without one"
            )
        return ours
    if ours is None:
        raise ValueError(
            "reference model has a trained context/embedding net but ours "
            "was built without one — pass the matching net when constructing"
        )
    if isinstance(ref, torch.nn.Linear):
        return _import_dense(ours, ref)
    if isinstance(ours, Module):
        return from_torch(ours, ref)
    raise NotImplementedError(
        f"cannot import context encoder of torch type {type(ref).__name__}"
    )


def _generic(ours, ref):
    """Default: recurse into same-named attributes."""
    updates = {}
    for f in type(ours)._child_fields:
        v = getattr(ours, f)
        if v is None:
            continue
        if not hasattr(ref, f):
            raise NotImplementedError(
                f"no generic mapping for {type(ours).__name__}.{f} "
                f"(reference {type(ref).__name__} has no attribute {f!r})"
            )
        updates[f] = _child(v, getattr(ref, f), what=f"{type(ours).__name__}.{f}")
    return ours.replace(**updates)


def _child(v, rv, what=""):
    if isinstance(v, Module):
        return from_torch(v, rv)
    if isinstance(v, (tuple, list)):
        if len(v) != len(rv):
            raise ValueError(f"{what}: length mismatch {len(v)} vs {len(rv)}")
        items = [_child(a, b, what=what) for a, b in zip(v, rv)]
        if hasattr(type(v), "_fields"):  # NamedTuple
            return type(v)(*items)
        return type(v)(items)
    if hasattr(v, "shape"):
        return _copy_array(v, rv, what=what)
    return v


def from_torch(ours, ref):
    """Return a copy of ``ours`` (an nflows_tpu Module) with parameters and
    buffers imported from ``ref`` (the matching reference torch module)."""
    import torch

    name = type(ours).__name__

    # --- primitives -------------------------------------------------------
    if name in ("Dense", "MaskedDense"):
        return _import_dense(ours, ref)
    if name == "Conv2d":
        return _import_conv(ours, ref)
    if name == "Dropout":
        return ours
    if name in ("MaskedResidualBlock", "ResidualBlock"):
        return _import_residual_block(ours, ref)
    if name == "ConvResidualBlock":
        return _import_conv_residual_block(ours, ref)
    if name == "MaskedFeedforwardBlock":
        updates = {"linear": _import_dense(ours.linear, ref.linear)}
        has_ours = ours.batch_norm is not None
        has_ref = getattr(ref, "batch_norm", None) is not None
        if has_ours != has_ref:
            raise ValueError(
                "use_batch_norm mismatch importing feedforward MADE block: "
                f"ours={has_ours}, reference={has_ref}"
            )
        if has_ours:
            updates["batch_norm"] = ours.batch_norm.replace(
                scale=_copy_array(ours.batch_norm.scale, ref.batch_norm.weight,
                                  what="BatchNorm.weight"),
                offset=_copy_array(ours.batch_norm.offset, ref.batch_norm.bias,
                                   what="BatchNorm.bias"),
                eps=float(ref.batch_norm.eps),
            )
        return ours.replace(**updates)
    if name == "MLP":
        if len(ours.hidden_layers) != len(ref._hidden_layers):
            raise ValueError(
                f"MLP hidden-layer count mismatch: ours "
                f"{len(ours.hidden_layers)} vs reference "
                f"{len(ref._hidden_layers)}"
            )
        return ours.replace(
            input_layer=_import_dense(ours.input_layer, ref._input_layer),
            hidden_layers=tuple(
                _import_dense(o, r)
                for o, r in zip(ours.hidden_layers, ref._hidden_layers)
            ),
            output_layer=_import_dense(ours.output_layer, ref._output_layer),
        )

    # --- flows & combinators ----------------------------------------------
    if isinstance(ours, _flows().Flow):
        updates = {
            "transform": from_torch(ours.transform, ref._transform),
            "distribution": from_torch(ours.distribution, ref._distribution),
        }
        if not isinstance(ref._embedding_net, torch.nn.Identity):
            updates["embedding_net"] = _import_encoder(
                ours.embedding_net, ref._embedding_net)
        return ours.replace(**updates)

    T = _transforms()
    if isinstance(ours, (T.CompositeTransform, T.MultiscaleCompositeTransform)):
        if len(ours.transforms) != len(ref._transforms):
            # scan-stacked sub-chains (e.g. GlowFlow(stacked=True) levels:
            # [squeeze, StackedTransform-of-steps]) compress k consecutive
            # reference transforms into ONE StackedTransform member —
            # align by flat length and hand each stack its k refs via a
            # synthetic composite
            import types as _types
            from nflows_tpu.transforms.stacked import (
                StackedTransform as _ST,
            )

            def flat_len(t):
                if isinstance(t, _ST):
                    return sum(
                        len(l.transforms)
                        if isinstance(l, T.CompositeTransform) else 1
                        for l in t.layers())
                return 1

            refs = list(ref._transforms)
            if sum(flat_len(o) for o in ours.transforms) != len(refs):
                raise ValueError("composite transform length mismatch")
            new, i = [], 0
            for o in ours.transforms:
                n = flat_len(o)
                r = (refs[i] if n == 1 and not isinstance(o, _ST)
                     else _types.SimpleNamespace(_transforms=refs[i:i + n]))
                new.append(from_torch(o, r))
                i += n
            return ours.replace(transforms=tuple(new))
        return ours.replace(transforms=tuple(
            from_torch(o, r) for o, r in zip(ours.transforms, ref._transforms)
        ))
    if isinstance(ours, T.InverseTransform):
        return ours.replace(transform=from_torch(ours.transform, ref._transform))
    from nflows_tpu.transforms.stacked import StackedTransform, stack_transforms
    if isinstance(ours, StackedTransform):
        # a scan-stacked chain mirrors a flat reference CompositeTransform:
        # unstack, import layer by layer, restack
        layers = ours.layers()
        refs = list(ref._transforms)
        per = [len(l.transforms) if isinstance(l, T.CompositeTransform) else 1
               for l in layers]
        if sum(per) != len(refs):
            raise ValueError(
                f"stacked chain covers {sum(per)} transforms but the "
                f"reference CompositeTransform has {len(refs)}")
        new_layers, i = [], 0
        for l, n in zip(layers, per):
            if isinstance(l, T.CompositeTransform):
                new_layers.append(l.replace(transforms=tuple(
                    from_torch(o, r)
                    for o, r in zip(l.transforms, refs[i:i + n]))))
            else:
                new_layers.append(from_torch(l, refs[i]))
            i += n
        return stack_transforms(new_layers)

    # --- transforms with renamed / recomputed fields ------------------------
    # (LU/QR/SVD/Householder/1x1-conv all share the reference's field names,
    # so the generic same-name rule at the bottom covers them.)
    if isinstance(ours, T.Permutation):
        return ours.replace(permutation=_copy_array(
            ours.permutation, ref._permutation, what="Permutation"))
    if isinstance(ours, T.NaiveLinear):
        return ours.replace(
            weight_param=_copy_array(ours.weight_param, ref._weight,
                                     what="NaiveLinear.weight"),
            bias=_copy_array(ours.bias, ref.bias, what="Linear.bias"),
        )
    if isinstance(ours, T.PointwiseAffineTransform):
        return ours.replace(
            shift=_copy_array(ours.shift, ref._shift, what="shift"),
            scale=_copy_array(ours.scale, ref._scale, what="scale"),
        )
    if isinstance(ours, T.ActNorm):
        new = _generic(ours, ref)
        return new.replace(initialized=bool(ref.initialized))
    if isinstance(ours, T.CouplingTransform):
        updates = {
            "transform_net": from_torch(ours.transform_net, ref.transform_net),
            "identity_features": _copy_array(
                ours.identity_features, ref.identity_features,
                what="identity_features"),
            "transform_features": _copy_array(
                ours.transform_features, ref.transform_features,
                what="transform_features"),
        }
        if ours.unconditional_transform is not None:
            updates["unconditional_transform"] = from_torch(
                ours.unconditional_transform, ref.unconditional_transform)
        new = ours.replace(**updates)
        inv = np.argsort(np.concatenate([
            np.asarray(new.identity_features), np.asarray(new.transform_features)
        ]))
        return new.replace(inverse_permutation=jnp.asarray(inv, dtype=jnp.int32))

    # --- distributions -------------------------------------------------------
    D = _distributions()
    if isinstance(ours, (D.ConditionalDiagonalNormal,
                         D.ConditionalIndependentBernoulli)):
        return ours.replace(context_encoder=_import_encoder(
            ours.context_encoder, ref._context_encoder))
    if isinstance(ours, D.MADEMoG):
        return ours.replace(made=from_torch(ours.made, ref._made))

    # --- everything else: same-named attributes ------------------------------
    return _generic(ours, ref)


def _flows():
    import nflows_tpu.flows as F
    return F


def _transforms():
    import nflows_tpu.transforms as T
    return T


def _distributions():
    import nflows_tpu.distributions as D
    return D
