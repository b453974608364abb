from nflows_tpu.ops.pallas.rq_spline import pallas_available, rq_spline_pallas
