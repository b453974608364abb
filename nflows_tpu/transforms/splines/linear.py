"""Alias of :mod:`nflows_tpu.ops.splines.linear` (reference import path)."""

from nflows_tpu.ops.splines.linear import *  # noqa: F401,F403
