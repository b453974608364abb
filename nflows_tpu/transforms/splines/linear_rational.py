"""Alias of :mod:`nflows_tpu.ops.splines.linear_rational` (beyond-reference)."""

from nflows_tpu.ops.splines.linear_rational import *  # noqa: F401,F403
