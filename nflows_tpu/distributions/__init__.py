from nflows_tpu.distributions.base import Distribution, NoMeanException
from nflows_tpu.distributions.normal import (
    ConditionalDiagonalNormal,
    DiagonalNormal,
    StandardNormal,
)
