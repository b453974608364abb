from nflows_tpu.nn.nets.mlp import MLP
from nflows_tpu.nn.nets.resnet import (
    ConvResidualBlock,
    ConvResidualNet,
    ResidualBlock,
    ResidualNet,
)
