from nflows_tpu.ops.splines import cubic, linear, linear_rational, quadratic, rational_quadratic
from nflows_tpu.ops.splines.cubic import cubic_spline, unconstrained_cubic_spline
from nflows_tpu.ops.splines.linear import linear_spline, unconstrained_linear_spline
from nflows_tpu.ops.splines.quadratic import (
    quadratic_spline,
    unconstrained_quadratic_spline,
)
from nflows_tpu.ops.splines.rational_quadratic import (
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)
from nflows_tpu.ops.splines.linear_rational import (
    linear_rational_spline,
    unconstrained_linear_rational_spline,
)
