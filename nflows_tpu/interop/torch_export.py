"""Export nflows_tpu weights into a reference (bayesiains/nflows) model.

``to_torch(ours, ref)`` is the inverse of
:func:`nflows_tpu.interop.from_torch`: it walks the two models in parallel
and writes our trained parameters/buffers into the torch module in place
(returning ``ref``). Build ``ref`` with the same architecture
hyperparameters; every leaf is shape-checked.

Use cases: hand a model back to a torch-based downstream (e.g. an sbi
pipeline still on the reference), or cross-validate — export and compare
log_probs computed by two independent implementations.

The case analysis mirrors torch_import.py (transposed ``nn.Linear``,
OIHW convs verbatim, container/private-name renames, residual-block
``linear_layers``/``batch_norm_layers`` packing, ActNorm's ``initialized``
buffer). Same-named leaf fields fall through to a generic rule.
"""

from __future__ import annotations

import numpy as np

from nflows_tpu.core.module import Module

__all__ = ["to_torch"]


def _set(ref_tensor, ours_arr, transpose=False, what=""):
    import torch

    a = np.asarray(ours_arr)
    if transpose:
        a = a.T
    if tuple(ref_tensor.shape) != a.shape:
        raise ValueError(
            f"shape mismatch exporting {what}: reference "
            f"{tuple(ref_tensor.shape)} vs ours {a.shape} — architectures "
            "must match"
        )
    with torch.no_grad():
        ref_tensor.copy_(torch.from_numpy(np.ascontiguousarray(a)))


def _export_dense(ours, ref):
    _set(ref.weight, ours.weight, transpose=True, what="Linear.weight")
    if (ours.bias is None) != (getattr(ref, "bias", None) is None):
        raise ValueError("bias presence mismatch exporting Linear")
    if ours.bias is not None:
        _set(ref.bias, ours.bias, what="Linear.bias")


def _export_conv(ours, ref):
    _set(ref.weight, ours.weight, what="Conv2d.weight")
    if ours.bias is not None:
        _set(ref.bias, ours.bias, what="Conv2d.bias")


def _export_batch_norms(ours, ref):
    has_ours = getattr(ours, "batch_norm_0", None) is not None
    has_ref = getattr(ref, "batch_norm_layers", None) is not None
    if has_ours != has_ref:
        raise ValueError("use_batch_norm mismatch exporting residual block")
    if has_ours:
        for i in (0, 1):
            bn_ours = getattr(ours, f"batch_norm_{i}")
            bn_ref = ref.batch_norm_layers[i]
            _set(bn_ref.weight, bn_ours.scale, what="BatchNorm.weight")
            _set(bn_ref.bias, bn_ours.offset, what="BatchNorm.bias")


def _export_residual_block(ours, ref):
    _export_dense(ours.linear_0, ref.linear_layers[0])
    _export_dense(ours.linear_1, ref.linear_layers[1])
    if getattr(ours, "context_layer", None) is not None:
        _export_dense(ours.context_layer, ref.context_layer)
    _export_batch_norms(ours, ref)


def _export_conv_residual_block(ours, ref):
    _export_conv(ours.conv_0, ref.conv_layers[0])
    _export_conv(ours.conv_1, ref.conv_layers[1])
    if getattr(ours, "context_layer", None) is not None:
        _export_conv(ours.context_layer, ref.context_layer)
    _export_batch_norms(ours, ref)


def _export_encoder(ours, ref):
    import torch

    if not isinstance(ref, torch.nn.Module) or isinstance(ref, torch.nn.Identity):
        if isinstance(ours, Module):
            raise ValueError(
                "ours has a trainable context/embedding net but the "
                "reference skeleton has none"
            )
        return
    if isinstance(ref, torch.nn.Linear):
        _export_dense(ours, ref)
        return
    to_torch(ours, ref)


def _generic(ours, ref):
    for f in type(ours)._child_fields:
        v = getattr(ours, f)
        if v is None:
            continue
        if not hasattr(ref, f):
            raise NotImplementedError(
                f"no generic export mapping for {type(ours).__name__}.{f}"
            )
        _child(v, getattr(ref, f), what=f"{type(ours).__name__}.{f}")


def _child(v, rv, what=""):
    if isinstance(v, Module):
        to_torch(v, rv)
    elif isinstance(v, (tuple, list)):
        if len(v) != len(rv):
            raise ValueError(f"{what}: length mismatch {len(v)} vs {len(rv)}")
        for a, b in zip(v, rv):
            _child(a, b, what=what)
    elif hasattr(v, "shape"):
        _set(rv, v, what=what)


def to_torch(ours, ref):
    """Write ``ours``' parameters/buffers into the matching reference torch
    module ``ref`` (mutated in place and returned)."""
    import torch

    name = type(ours).__name__

    if name in ("Dense", "MaskedDense"):
        _export_dense(ours, ref)
        return ref
    if name == "Conv2d":
        _export_conv(ours, ref)
        return ref
    if name == "Dropout":
        return ref
    if name in ("MaskedResidualBlock", "ResidualBlock"):
        _export_residual_block(ours, ref)
        return ref
    if name == "ConvResidualBlock":
        _export_conv_residual_block(ours, ref)
        return ref
    if name == "MaskedFeedforwardBlock":
        _export_dense(ours.linear, ref.linear)
        return ref
    if name == "MLP":
        if len(ours.hidden_layers) != len(ref._hidden_layers):
            raise ValueError("MLP hidden-layer count mismatch")
        _export_dense(ours.input_layer, ref._input_layer)
        for o, r in zip(ours.hidden_layers, ref._hidden_layers):
            _export_dense(o, r)
        _export_dense(ours.output_layer, ref._output_layer)
        return ref

    F = _flows()
    if isinstance(ours, F.Flow):
        to_torch(ours.transform, ref._transform)
        to_torch(ours.distribution, ref._distribution)
        if ours.embedding_net is not None or not isinstance(
                ref._embedding_net, torch.nn.Identity):
            _export_encoder(ours.embedding_net, ref._embedding_net)
        return ref

    T = _transforms()
    if isinstance(ours, (T.CompositeTransform, T.MultiscaleCompositeTransform)):
        if len(ours.transforms) != len(ref._transforms):
            raise ValueError("composite transform length mismatch")
        for o, r in zip(ours.transforms, ref._transforms):
            to_torch(o, r)
        return ref
    if isinstance(ours, T.InverseTransform):
        to_torch(ours.transform, ref._transform)
        return ref
    if isinstance(ours, T.Permutation):
        _set(ref._permutation, ours.permutation, what="Permutation")
        return ref
    if isinstance(ours, T.NaiveLinear):
        _set(ref._weight, ours.weight_param, what="NaiveLinear.weight")
        _set(ref.bias, ours.bias, what="Linear.bias")
        return ref
    if isinstance(ours, T.ActNorm):
        _set(ref.log_scale, ours.log_scale, what="ActNorm.log_scale")
        _set(ref.shift, ours.shift, what="ActNorm.shift")
        with torch.no_grad():
            ref.initialized.fill_(bool(ours.initialized))
        return ref
    if isinstance(ours, T.CouplingTransform):
        to_torch(ours.transform_net, ref.transform_net)
        _set(ref.identity_features, ours.identity_features,
             what="identity_features")
        _set(ref.transform_features, ours.transform_features,
             what="transform_features")
        if ours.unconditional_transform is not None:
            to_torch(ours.unconditional_transform, ref.unconditional_transform)
        return ref
    if isinstance(ours, T.PointwiseAffineTransform):
        # reference stores _shift/_scale as plain attributes (floats/tensors)
        _set(ref._shift, ours.shift, what="shift")
        _set(ref._scale, ours.scale, what="scale")
        return ref

    D = _distributions()
    if isinstance(ours, (D.ConditionalDiagonalNormal,
                         D.ConditionalIndependentBernoulli)):
        _export_encoder(ours.context_encoder, ref._context_encoder)
        return ref
    if isinstance(ours, D.MADEMoG):
        to_torch(ours.made, ref._made)
        return ref

    _generic(ours, ref)
    return ref


def _flows():
    import nflows_tpu.flows as F
    return F


def _transforms():
    import nflows_tpu.transforms as T
    return T


def _distributions():
    import nflows_tpu.distributions as D
    return D
