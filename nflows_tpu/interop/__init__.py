"""Interoperability with the reference implementation (bayesiains/nflows).

``from_torch(ours, ref)`` imports the weights of a trained reference
(PyTorch) model into a structurally matching nflows_tpu model, so reference
users can migrate trained flows without retraining. ``to_torch(ours, ref)``
is the inverse: export an nflows_tpu model back into a reference skeleton
(handing results to torch-based downstreams, or cross-validating the two
implementations against each other).
"""

from nflows_tpu.interop.torch_export import to_torch
from nflows_tpu.interop.torch_import import from_torch

__all__ = ["from_torch", "to_torch"]
