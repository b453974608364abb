"""nflows_tpu — a TPU-native normalizing-flows framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of
``bayesiains/nflows`` (transforms zoo, distributions, conditioner networks,
Flow API) plus what the reference never had: jit-compiled train/sample paths,
Pallas-fused spline kernels, and mesh-sharded multi-chip execution.
"""

from nflows_tpu.version import VERSION, __version__

from nflows_tpu import distributions, flows, transforms, utils
from nflows_tpu.core.module import Module, combine, partition, set_training
from nflows_tpu.flows.base import Flow
