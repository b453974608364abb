"""Reference import-path alias (nflows/transforms/UMNN/__init__.py):
``from nflows_tpu.transforms.UMNN import MonotonicNormalizer, IntegrandNet``.
The implementation is native Clenshaw-Curtis quadrature in
nflows_tpu/transforms/umnn.py (no external `umnn` pip dependency)."""

from nflows_tpu.transforms.umnn import IntegrandNet, MonotonicNormalizer

__all__ = ["MonotonicNormalizer", "IntegrandNet"]
