from nflows_tpu.transforms.base import (
    CompositeTransform,
    InputOutsideDomain,
    InverseNotAvailable,
    InverseTransform,
    MultiscaleCompositeTransform,
    Transform,
)
from nflows_tpu.transforms.permutations import (
    Permutation,
    RandomPermutation,
    ReversePermutation,
)
from nflows_tpu.transforms.standard import (
    AffineScalarTransform,
    AffineTransform,
    IdentityTransform,
    PointwiseAffineTransform,
)
