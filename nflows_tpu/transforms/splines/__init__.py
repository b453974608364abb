"""Functional spline kernels under the reference's import path
(reference: nflows/transforms/splines/__init__.py).

The implementations live in :mod:`nflows_tpu.ops.splines` (the compute
layer); this package mirrors the reference's module layout so existing
imports like ``from nflows.transforms.splines import rational_quadratic``
port by renaming only the top-level package.
"""

from nflows_tpu.transforms.splines.cubic import cubic_spline, unconstrained_cubic_spline
from nflows_tpu.transforms.splines.linear import linear_spline, unconstrained_linear_spline
from nflows_tpu.transforms.splines.quadratic import (
    quadratic_spline,
    unconstrained_quadratic_spline,
)
from nflows_tpu.transforms.splines.rational_quadratic import (
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)
from nflows_tpu.transforms.splines.linear_rational import (
    linear_rational_spline,
    unconstrained_linear_rational_spline,
)
