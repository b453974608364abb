"""Interoperability with the reference implementation (bayesiains/nflows).

``from_torch(ours, ref)`` imports the weights of a trained reference
(PyTorch) model into a structurally matching nflows_tpu model, so reference
users can migrate trained flows without retraining.
"""

from nflows_tpu.interop.torch_import import from_torch

__all__ = ["from_torch"]
