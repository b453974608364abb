"""Prebuilt model families."""

from nflows_tpu.flows.autoregressive import MaskedAutoregressiveFlow
from nflows_tpu.flows.realnvp import SimpleRealNVP
from nflows_tpu.models.glow import GlowFlow
from nflows_tpu.models.iaf import InverseAutoregressiveFlow
from nflows_tpu.models.nsf import NeuralSplineFlow
from nflows_tpu.models.nsf_ar import NeuralSplineFlowAR
