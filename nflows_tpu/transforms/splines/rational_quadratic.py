"""Alias of :mod:`nflows_tpu.ops.splines.rational_quadratic` (reference import path)."""

from nflows_tpu.ops.splines.rational_quadratic import *  # noqa: F401,F403
