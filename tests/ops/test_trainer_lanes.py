"""VMEM-aware lane-tile selection for the fused trainers.

The backward megakernel's VMEM footprint grows ~linearly with the lane
tile (all layers' in-kernel vjp residuals are live at once), so at the
flagship config a 1024-lane tile compiles to ~150 MiB — over the chip's
128 MiB VMEM (observed on TPU v5e at batch 2048, 2026-08-18). The base
class therefore sizes the tile from an analytic per-lane estimate
instead of always taking the largest <=1024 divisor.
"""

import jax
import pytest

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer


def _flagship(key):
    return NeuralSplineFlow(
        features=6, hidden_features=256, num_layers=10,
        num_blocks_per_layer=2, num_bins=8, stacked=True, key=key)


def test_flagship_lane_tile_fits_vmem():
    flow = _flagship(jax.random.PRNGKey(0))
    for batch in (512, 2048, 8192):
        t = FusedNSFTrainer(flow, batch_size=batch, interpret=True)
        est = t._fixed_vmem_bytes() + t._lanes * t._lane_vmem_bytes()
        assert est <= t._VMEM_BUDGET
        assert batch % t._lanes == 0
        # the estimate must also veto the tile that OOM'd on hardware
        assert (t._fixed_vmem_bytes() + 1024 * t._lane_vmem_bytes()
                > t._VMEM_BUDGET)


def test_small_models_keep_full_tiles():
    tiny = NeuralSplineFlow(
        features=4, hidden_features=32, num_layers=2,
        num_blocks_per_layer=2, num_bins=4, stacked=True,
        key=jax.random.PRNGKey(0))
    t = FusedNSFTrainer(tiny, batch_size=1024, interpret=True)
    assert t._lanes == 1024


def test_lane_estimate_anchored_to_measured_footprint():
    """The 2026-08-18 hardware anchor: flagship backward at lanes=1024
    compiled to 150.26 MiB total / ~125 KiB per lane. The analytic
    per-lane estimate must bracket that from above (conservative) but
    not by more than 2x (or it would needlessly shrink every tile)."""
    flow = _flagship(jax.random.PRNGKey(0))
    t = FusedNSFTrainer(flow, batch_size=512, interpret=True)
    measured_per_lane = 125 * 1024
    assert measured_per_lane <= t._lane_vmem_bytes() <= 2 * measured_per_lane


def test_bad_batch_rejected():
    tiny = NeuralSplineFlow(
        features=4, hidden_features=32, num_layers=2,
        num_blocks_per_layer=2, num_bins=4, stacked=True,
        key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="multiple of 128"):
        FusedNSFTrainer(tiny, batch_size=100, interpret=True)
