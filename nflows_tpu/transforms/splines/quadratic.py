"""Alias of :mod:`nflows_tpu.ops.splines.quadratic` (reference import path)."""

from nflows_tpu.ops.splines.quadratic import *  # noqa: F401,F403
