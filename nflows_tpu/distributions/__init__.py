from nflows_tpu.distributions.base import Distribution, NoMeanException
from nflows_tpu.distributions.discrete import ConditionalIndependentBernoulli
from nflows_tpu.distributions.mixture import MADEMoG
from nflows_tpu.distributions.normal import (
    ConditionalDiagonalNormal,
    DiagonalNormal,
    StandardNormal,
)
from nflows_tpu.distributions.uniform import (
    BoxUniform,
    LotkaVolterraOscillating,
    MG1Uniform,
)
