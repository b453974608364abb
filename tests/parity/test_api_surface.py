"""API-surface completeness: every public name the reference exports must
exist in nflows_tpu (SURVEY.md §2 inventory check)."""

import pytest


REFERENCE_TRANSFORMS = [
    # autoregressive (reference transforms/__init__.py:1-8)
    "MaskedAffineAutoregressiveTransform",
    "MaskedPiecewiseCubicAutoregressiveTransform",
    "MaskedPiecewiseLinearAutoregressiveTransform",
    "MaskedPiecewiseQuadraticAutoregressiveTransform",
    "MaskedPiecewiseRationalQuadraticAutoregressiveTransform",
    "MaskedUMNNAutoregressiveTransform",
    # base (:9-16)
    "CompositeTransform", "InputOutsideDomain", "InverseNotAvailable",
    "InverseTransform", "MultiscaleCompositeTransform", "Transform",
    # conv/coupling (:17-27)
    "OneByOneConvolution",
    "AdditiveCouplingTransform", "AffineCouplingTransform",
    "PiecewiseCubicCouplingTransform", "PiecewiseLinearCouplingTransform",
    "PiecewiseQuadraticCouplingTransform",
    "PiecewiseRationalQuadraticCouplingTransform", "UMNNCouplingTransform",
    # linear/lu (:28-29)
    "NaiveLinear", "LULinear",
    # nonlinearities (:30-43)
    "CompositeCDFTransform", "Exp", "GatedLinearUnit", "LeakyReLU", "Logit",
    "LogTanh", "PiecewiseCubicCDF", "PiecewiseLinearCDF",
    "PiecewiseQuadraticCDF", "PiecewiseRationalQuadraticCDF", "Sigmoid",
    "Tanh",
    # normalization/orthogonal/permutations (:44-49)
    "ActNorm", "BatchNorm", "HouseholderSequence",
    "Permutation", "RandomPermutation", "ReversePermutation",
    # qr/reshape/standard/svd (:50-58)
    "QRLinear", "SqueezeTransform",
    "AffineScalarTransform", "AffineTransform", "IdentityTransform",
    "PointwiseAffineTransform", "SVDLinear",
]

REFERENCE_DISTRIBUTIONS = [
    "Distribution", "StandardNormal", "ConditionalDiagonalNormal",
    "DiagonalNormal", "ConditionalIndependentBernoulli", "MADEMoG",
    "BoxUniform", "MG1Uniform", "LotkaVolterraOscillating",
]

REFERENCE_FLOWS = ["Flow", "SimpleRealNVP", "MaskedAutoregressiveFlow"]

REFERENCE_NN = ["MADE", "MixtureOfGaussiansMADE"]
REFERENCE_NETS = ["MLP", "ResidualNet", "ConvResidualNet"]

REFERENCE_UTILS = [
    "tile", "sum_except_batch", "split_leading_dim", "merge_leading_dims",
    "repeat_rows", "logabsdet", "random_orthogonal", "searchsorted", "cbrt",
    "get_temperature", "gaussian_kde_log_eval",
    "create_alternating_binary_mask", "create_mid_split_binary_mask",
    "create_random_binary_mask",
    # reference utils/__init__ star-imports typechecks + torchutils, so
    # these are reachable as nflows.utils.<name> too
    "get_num_parameters", "is_bool", "is_int", "is_positive_int",
    "is_nonnegative_int", "is_power_of_two",
]


REFERENCE_SPLINE_FUNCS = [
    "cubic_spline", "unconstrained_cubic_spline",
    "linear_spline", "unconstrained_linear_spline",
    "quadratic_spline", "unconstrained_quadratic_spline",
    "rational_quadratic_spline", "unconstrained_rational_quadratic_spline",
]


@pytest.mark.parametrize("name", REFERENCE_SPLINE_FUNCS)
def test_spline_functional_exported(name):
    # reference import path: nflows.transforms.splines.<fn>
    import nflows_tpu.transforms.splines as S
    assert hasattr(S, name), f"transforms.splines.{name} missing"


def test_umnn_import_path():
    # reference path: nflows.transforms.UMNN.MonotonicNormalizer
    from nflows_tpu.transforms.UMNN import IntegrandNet, MonotonicNormalizer
    from nflows_tpu.transforms.UMNN.MonotonicNormalizer import (
        MonotonicNormalizer as M2,
    )
    assert MonotonicNormalizer is M2 and IntegrandNet is not None


def test_reference_module_paths():
    # paths reference users import from directly
    from nflows_tpu.transforms.made import MADE  # transforms/made.py
    from nflows_tpu.utils.torchutils import searchsorted, tile  # utils/torchutils.py
    from nflows_tpu.utils.typechecks import is_positive_int
    assert MADE and searchsorted and tile and is_positive_int


def test_nde_made_module_path():
    # reference path: nflows/nn/nde/made.py
    from nflows_tpu.nn.nde.made import MixtureOfGaussiansMADE
    from nflows_tpu.nn.nde import MixtureOfGaussiansMADE as M2
    from nflows_tpu.nn import MixtureOfGaussiansMADE as M3
    assert MixtureOfGaussiansMADE is M2 is M3


def test_version_module():
    # reference: nflows/version.py defines __version__ and VERSION
    from nflows_tpu.version import VERSION, __version__
    import nflows_tpu
    assert VERSION == __version__ == nflows_tpu.__version__


def test_get_num_parameters_counts_trainable():
    import jax
    import nflows_tpu.utils as U
    from nflows_tpu.flows import SimpleRealNVP

    flow = SimpleRealNVP(features=2, hidden_features=8, num_layers=1,
                         num_blocks_per_layer=1, key=jax.random.key(0))
    assert U.get_num_parameters(flow) == flow.num_parameters() > 0


@pytest.mark.parametrize("name", REFERENCE_TRANSFORMS)
def test_transform_exported(name):
    import nflows_tpu.transforms as T
    assert hasattr(T, name), f"transforms.{name} missing"


@pytest.mark.parametrize("name", REFERENCE_DISTRIBUTIONS)
def test_distribution_exported(name):
    import nflows_tpu.distributions as D
    assert hasattr(D, name), f"distributions.{name} missing"


@pytest.mark.parametrize("name", REFERENCE_FLOWS)
def test_flow_exported(name):
    import nflows_tpu.flows as F
    assert hasattr(F, name), f"flows.{name} missing"


@pytest.mark.parametrize("name", REFERENCE_NN)
def test_nn_exported(name):
    import nflows_tpu.nn as N
    assert hasattr(N, name), f"nn.{name} missing"


@pytest.mark.parametrize("name", REFERENCE_NETS)
def test_nets_exported(name):
    import nflows_tpu.nn.nets as N
    assert hasattr(N, name), f"nn.nets.{name} missing"


@pytest.mark.parametrize("name", REFERENCE_UTILS)
def test_util_exported(name):
    import nflows_tpu.utils as U
    assert hasattr(U, name), f"utils.{name} missing"
