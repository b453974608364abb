"""Data-parallel fused training (round 3): FusedNSFTrainer.make_dp_train_step
runs the forward+backward megakernels per-shard under shard_map with
pmean'd gradients — one DP step over 8 virtual devices must equal the
single-device fused step on the same global batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer


def _flow():
    return NeuralSplineFlow(
        features=6, hidden_features=32, num_layers=3,
        num_blocks_per_layer=2, num_bins=4, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0))


def test_dp_step_equals_single_device():
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(devices, ("data",))

    batch = jnp.asarray(
        np.random.default_rng(1).normal(size=(1024, 6)) * 1.5, jnp.float32)
    opt = optax.adam(3e-4)

    tr = FusedNSFTrainer(_flow(), batch_size=1024, interpret=True)
    w0 = tr.weights
    s0 = tr.init_opt(opt)

    single = tr.make_train_step(opt, donate=False)
    w1, s1, loss1 = single(w0, s0, batch)

    dp = tr.make_dp_train_step(opt, mesh, donate=False)
    w2, s2, loss2 = dp(w0, s0, batch)

    # equal shards: pmean of shard means == global mean, up to fp32
    # reassociation of the mean (measured ~3e-6 on loss ~12.8)
    assert abs(float(loss1) - float(loss2)) < 1e-5
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   atol=1e-6, err_msg=k)


def test_dp_rejects_misaligned_per_device_batch():
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    tr = FusedNSFTrainer(_flow(), batch_size=512, interpret=True)
    with pytest.raises(ValueError, match="per-device"):
        tr.make_dp_train_step(optax.adam(1e-3), mesh)


def test_maf_dp_step_equals_single_device():
    """The AR trainer's DP step (per-shard megakernels, pmean'd grads)
    must equal its single-device step on the same global batch."""
    from jax.sharding import Mesh

    from nflows_tpu.flows import MaskedAutoregressiveFlow
    from nflows_tpu.ops.pallas.maf_train import FusedMAFTrainer

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    flow = MaskedAutoregressiveFlow(
        features=5, hidden_features=16, num_layers=2,
        num_blocks_per_layer=2, use_random_permutations=True,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    batch = jnp.asarray(
        np.random.default_rng(1).normal(size=(1024, 5)) * 1.5, jnp.float32)
    opt = optax.adam(3e-4)

    tr = FusedMAFTrainer(flow, batch_size=1024, interpret=True)
    w0, s0 = tr.weights, tr.init_opt(opt)

    w1, s1, loss1 = tr.make_train_step(opt, donate=False)(w0, s0, batch)
    w2, s2, loss2 = tr.make_dp_train_step(opt, mesh, donate=False)(
        w0, s0, batch)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   atol=1e-6, err_msg=k)


def test_mademog_dp_step_equals_single_device():
    """The mixture-density trainer inherits the DP step through
    FusedTrainerBase; per-shard megakernels + pmean'd grads must equal
    the single-device step on the same global batch."""
    from jax.sharding import Mesh

    from nflows_tpu.nn.nde.made import MixtureOfGaussiansMADE
    from nflows_tpu.ops.pallas.mademog_train import FusedMADEMoGTrainer

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    made = MixtureOfGaussiansMADE(
        features=5, hidden_features=16, num_blocks=2,
        num_mixture_components=4, context_features=None,
        key=jax.random.key(0), rng=np.random.default_rng(0))
    batch = jnp.asarray(
        np.random.default_rng(1).normal(size=(1024, 5)) * 1.5, jnp.float32)
    opt = optax.adam(3e-4)

    tr = FusedMADEMoGTrainer(made, batch_size=1024, interpret=True)
    w0, s0 = tr.weights, tr.init_opt(opt)

    w1, s1, loss1 = tr.make_train_step(opt, donate=False)(w0, s0, batch)
    w2, s2, loss2 = tr.make_dp_train_step(opt, mesh, donate=False)(
        w0, s0, batch)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   atol=1e-6, err_msg=k)
