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


def test_fused_trainer_state_checkpoints(tmp_path):
    """The fused trainers' (weights, opt_state) are plain pytrees; a
    save/restore mid-training must continue exactly where an
    uninterrupted run lands (the fused analogue of TrainState resume)."""
    import jax.numpy as jnp
    import optax

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import restore_checkpoint, save_checkpoint

    flow = NeuralSplineFlow(features=4, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    tr = fused_trainer(flow, batch_size=128, interpret=True)
    opt = optax.adam(1e-2)
    step = tr.make_train_step(opt, donate=False)

    def batch(i):
        return jnp.asarray(
            np.random.default_rng(i).normal(size=(128, 4)), jnp.float32)

    w, s = tr.weights, tr.init_opt(opt)
    w, s, _ = step(w, s, batch(0))
    save_checkpoint(str(tmp_path / "ckpt"), {"weights": w, "opt_state": s})
    w, s, _ = step(w, s, batch(1))
    loss_uninterrupted = float(step(w, s, batch(2))[2])

    restored = restore_checkpoint(str(tmp_path / "ckpt"),
                                  {"weights": tr.weights,
                                   "opt_state": tr.init_opt(opt)})
    w2, s2 = restored["weights"], restored["opt_state"]
    w2, s2, _ = step(w2, s2, batch(1))
    loss_resumed = float(step(w2, s2, batch(2))[2])
    assert loss_uninterrupted == loss_resumed


def test_fused_trainer_composes_with_run_training(tmp_path):
    """make_loop_step/init_loop_state: the fused trainer drives
    run_training unchanged — checkpoint mid-run, resume from a fresh
    state, land on the identical weights."""
    import jax.numpy as jnp
    import optax

    from nflows_tpu.data import NumpyDataLoader
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training.loop import run_training

    flow = NeuralSplineFlow(features=4, hidden_features=16, num_layers=2,
                            num_blocks_per_layer=1, num_bins=4,
                            key=jax.random.key(0),
                            rng=np.random.default_rng(0))
    tr = fused_trainer(flow, batch_size=128, interpret=True)
    opt = optax.adam(1e-2)
    step = tr.make_loop_step(opt, donate=False)
    X = np.random.default_rng(0).normal(size=(512, 4)).astype(np.float32)
    ckdir = str(tmp_path / "run")

    state = run_training(tr.init_loop_state(opt), step,
                         NumpyDataLoader(X, batch_size=128, seed=0),
                         num_steps=4, checkpoint_dir=ckdir,
                         checkpoint_every=2, log_every=2,
                         prepare_batch=jnp.asarray)
    assert int(state.step) == 4

    # resume from a fresh init: restores step 4, trains 2 more
    resumed = run_training(tr.init_loop_state(opt), step,
                           NumpyDataLoader(X, batch_size=128, seed=0),
                           num_steps=6, checkpoint_dir=ckdir,
                           checkpoint_every=2, log_every=2,
                           prepare_batch=jnp.asarray)
    assert int(resumed.step) == 6

    # uninterrupted 6-step run lands on identical weights
    straight = run_training(tr.init_loop_state(opt), step,
                            NumpyDataLoader(X, batch_size=128, seed=0),
                            num_steps=6, log_every=2,
                            prepare_batch=jnp.asarray)
    for k in straight.params:
        np.testing.assert_array_equal(np.asarray(resumed.params[k]),
                                      np.asarray(straight.params[k]),
                                      err_msg=k)


def test_auto_applies_measured_crossover():
    """auto=True routes by the measured fused-vs-XLA training crossover
    (BASELINE.md round-4/5 measurements): NSF fused only from batch 2048,
    MAF/MADEMoG never, IAF (VI, no XLA head-to-head) always."""
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.models import (
        InverseAutoregressiveFlow,
        NeuralSplineFlow,
    )
    from nflows_tpu.ops.pallas.maf_train import FusedIAFTrainer
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    nsf = NeuralSplineFlow(features=4, hidden_features=16, num_layers=2,
                           num_blocks_per_layer=1, num_bins=4,
                           key=jax.random.key(0),
                           rng=np.random.default_rng(0))
    assert fused_trainer(nsf, batch_size=512, interpret=True,
                         auto=True) is None
    assert isinstance(
        fused_trainer(nsf, batch_size=2048, interpret=True, auto=True),
        FusedNSFTrainer)

    maf = MaskedAutoregressiveFlow(
        features=4, hidden_features=16, num_layers=2,
        num_blocks_per_layer=1, use_random_permutations=True,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    assert fused_trainer(maf, batch_size=8192, interpret=True,
                         auto=True) is None

    iaf = InverseAutoregressiveFlow(features=4, hidden_features=16,
                                    num_layers=2, num_blocks_per_layer=1,
                                    key=jax.random.key(0))
    assert isinstance(
        fused_trainer(iaf, batch_size=128, interpret=True, auto=True),
        FusedIAFTrainer)


def test_auto_implies_not_required():
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.transforms import LULinear

    flow = Flow(transform=LULinear(4, key=jax.random.key(0)),
                distribution=StandardNormal([4]))
    assert fused_trainer(flow, batch_size=2048, interpret=True,
                         auto=True) is None


def test_crossover_override_flips_auto_selection():
    """config.fused_train_crossover overrides the measured floors (the
    defaults are TPU v5-lite numbers; other hardware re-measures with
    benchmarks/bench_fused_train.py and installs new floors here)."""
    from nflows_tpu import config
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.ops.pallas.maf_train import FusedMAFTrainer
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    nsf = NeuralSplineFlow(features=4, hidden_features=16, num_layers=2,
                           num_blocks_per_layer=1, num_bins=4,
                           key=jax.random.key(0),
                           rng=np.random.default_rng(0))
    maf = MaskedAutoregressiveFlow(
        features=4, hidden_features=16, num_layers=2,
        num_blocks_per_layer=1, use_random_permutations=True,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    try:
        # NSF default floor is 2048 -> batch 512 routes to XLA; lower it.
        config.fused_train_crossover({"nsf": 512})
        assert isinstance(
            fused_trainer(nsf, batch_size=512, interpret=True, auto=True),
            FusedNSFTrainer)
        # MAF default is never-fused; flip it on.
        config.fused_train_crossover({"maf": 0})
        assert isinstance(
            fused_trainer(maf, batch_size=128, interpret=True, auto=True),
            FusedMAFTrainer)
        # NSF override still in force (calls merge).
        assert config.fused_train_crossover() == {"nsf": 512, "maf": 0}
    finally:
        config.clear_fused_train_crossover()
    # Back to defaults after clearing.
    assert fused_trainer(nsf, batch_size=512, interpret=True,
                         auto=True) is None
    assert fused_trainer(maf, batch_size=8192, interpret=True,
                         auto=True) is None
    with pytest.raises(ValueError, match="unknown"):
        config.fused_train_crossover({"glow": 128})


def test_explicit_required_raises_under_auto_on_no_match():
    """auto=True + explicit required=True distinguishes 'no kernel
    matches' (a misconfigured flow -> raise) from 'crossover says XLA'
    (-> None)."""
    from nflows_tpu.distributions import StandardNormal
    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.flows.base import Flow
    from nflows_tpu.transforms import LULinear

    flow = Flow(transform=LULinear(4, key=jax.random.key(0)),
                distribution=StandardNormal([4]))
    with pytest.raises(ValueError, match="no fused training kernel"):
        fused_trainer(flow, batch_size=2048, interpret=True, auto=True,
                      required=True)
    # ... but a MATCHING flow that the crossover routes to XLA stays None
    # even with required=True.
    maf = MaskedAutoregressiveFlow(
        features=4, hidden_features=16, num_layers=2,
        num_blocks_per_layer=1, use_random_permutations=True,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    assert fused_trainer(maf, batch_size=2048, interpret=True, auto=True,
                         required=True) is None
