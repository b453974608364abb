from nflows_tpu.flows.base import Flow
