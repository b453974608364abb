from nflows_tpu.flows.autoregressive import MaskedAutoregressiveFlow
from nflows_tpu.flows.base import Flow
from nflows_tpu.flows.realnvp import SimpleRealNVP
