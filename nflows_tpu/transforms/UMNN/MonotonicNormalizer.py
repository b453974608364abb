"""Alias of the reference's module path nflows/transforms/UMNN/MonotonicNormalizer.py."""

from nflows_tpu.transforms.umnn import IntegrandNet, MonotonicNormalizer  # noqa: F401
