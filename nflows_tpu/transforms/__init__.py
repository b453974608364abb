from nflows_tpu.transforms.autoregressive import (
    AutoregressiveTransform,
    MaskedUMNNAutoregressiveTransform,
    MaskedAffineAutoregressiveTransform,
    MaskedPiecewiseCubicAutoregressiveTransform,
    MaskedPiecewiseLinearAutoregressiveTransform,
    MaskedPiecewiseQuadraticAutoregressiveTransform,
    MaskedPiecewiseRationalQuadraticAutoregressiveTransform,
    MaskedPiecewiseLinearRationalAutoregressiveTransform,
)
from nflows_tpu.transforms.base import (
    CompositeTransform,
    InputOutsideDomain,
    InverseNotAvailable,
    InverseTransform,
    MultiscaleCompositeTransform,
    Transform,
)
from nflows_tpu.transforms.coupling import (
    AdditiveCouplingTransform,
    AffineCouplingTransform,
    CouplingTransform,
    PiecewiseCouplingTransform,
    PiecewiseCubicCouplingTransform,
    PiecewiseLinearCouplingTransform,
    PiecewiseQuadraticCouplingTransform,
    PiecewiseRationalQuadraticCouplingTransform,
    PiecewiseLinearRationalCouplingTransform,
    UMNNCouplingTransform,
)
from nflows_tpu.transforms.nonlinearities import (
    CauchyCDF,
    CauchyCDFInverse,
    CompositeCDFTransform,
    Exp,
    GatedLinearUnit,
    LeakyReLU,
    Logit,
    LogTanh,
    PiecewiseCubicCDF,
    PiecewiseLinearCDF,
    PiecewiseQuadraticCDF,
    PiecewiseRationalQuadraticCDF,
    PiecewiseLinearRationalCDF,
    Sigmoid,
    Tanh,
)
from nflows_tpu.transforms.normalization import ActNorm, BatchNorm
from nflows_tpu.transforms.permutations import (
    Permutation,
    RandomPermutation,
    ReversePermutation,
)
from nflows_tpu.transforms.stacked import StackedTransform, stack_transforms
from nflows_tpu.transforms.standard import (
    AffineScalarTransform,
    AffineTransform,
    IdentityTransform,
    PointwiseAffineTransform,
)

# MADE lives in nn/ but is re-exported here for reference API parity
# (reference keeps it at nflows/transforms/made.py with a TODO to move it).
from nflows_tpu.nn.made import MADE
from nflows_tpu.transforms.conv import OneByOneConvolution
from nflows_tpu.transforms.linear import Linear, NaiveLinear, precompute_linear_caches
from nflows_tpu.transforms.lu import LULinear
from nflows_tpu.transforms.orthogonal import HouseholderSequence
from nflows_tpu.transforms.qr import QRLinear
from nflows_tpu.transforms.reshape import SqueezeTransform
from nflows_tpu.transforms.svd import SVDLinear
from nflows_tpu.transforms.umnn import IntegrandNet, MonotonicNormalizer
