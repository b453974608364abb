from nflows_tpu.ops import binning, splines
