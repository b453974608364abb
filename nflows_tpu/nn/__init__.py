from nflows_tpu.nn import nets
from nflows_tpu.nn.nde import MixtureOfGaussiansMADE
from nflows_tpu.nn.made import MADE, MaskedDense, MaskedFeedforwardBlock, MaskedResidualBlock
from nflows_tpu.nn.primitives import Conv2d, Dense, Dropout, glu
