from nflows_tpu.ops.pallas.lrs_spline import lrs_spline_pallas
from nflows_tpu.ops.pallas.rq_spline import pallas_available, rq_spline_pallas
