"""training.fused_trainer auto-selection: each flow family gets its
matching megakernel trainer; non-qualifying flows fall through."""

import jax
import numpy as np
import pytest

from nflows_tpu.training import fused_trainer


def test_selects_nsf_trainer():
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    flow = NeuralSplineFlow(features=4, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    tr = fused_trainer(flow, batch_size=128, interpret=True)
    assert isinstance(tr, FusedNSFTrainer)


def test_selects_maf_trainer():
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.ops.pallas.maf_train import FusedMAFTrainer

    flow = MaskedAutoregressiveFlow(
        features=4, hidden_features=16, num_layers=2,
        num_blocks_per_layer=1, use_random_permutations=True,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    tr = fused_trainer(flow, batch_size=128, interpret=True)
    assert isinstance(tr, FusedMAFTrainer)


def test_selects_iaf_trainer():
    from nflows_tpu.models import InverseAutoregressiveFlow
    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer

    flow = InverseAutoregressiveFlow(features=4, hidden_features=16,
                                     num_layers=2, num_blocks_per_layer=1,
                                     key=jax.random.key(0))
    tr = fused_trainer(flow, batch_size=128, interpret=True)
    assert isinstance(tr, FusedIAFTrainer)


def test_non_qualifying_flow():
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.transforms import LULinear

    flow = Flow(transform=LULinear(4, key=jax.random.key(0)),
                distribution=StandardNormal([4]))
    assert fused_trainer(flow, batch_size=128, interpret=True,
                         required=False) is None
    with pytest.raises(ValueError, match="XLA chain"):
        fused_trainer(flow, batch_size=128, interpret=True)


def test_bad_batch_size():
    from nflows_tpu.models import NeuralSplineFlow

    flow = NeuralSplineFlow(features=4, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    with pytest.raises(ValueError, match="128"):
        fused_trainer(flow, batch_size=100, interpret=True)
