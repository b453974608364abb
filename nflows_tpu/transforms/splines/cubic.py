"""Alias of :mod:`nflows_tpu.ops.splines.cubic` (reference import path)."""

from nflows_tpu.ops.splines.cubic import *  # noqa: F401,F403
