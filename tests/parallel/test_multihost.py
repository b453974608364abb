"""Multi-host (multi-process) DP: 2 JAX processes x 2 CPU devices over a
local coordinator, with checkpoint-recovery across a process generation.

This exercises the real ``jax.distributed`` path (parallel/mesh.py:
initialize_distributed) that single-process mesh tests cannot: DCN-style
bootstrap, a global mesh spanning processes, process-local data feeding
(``make_array_from_process_local_data``), cross-process collectives, and
orbax save/restore where the restoring processes are NOT the saving ones
(the failure-recovery story: round-1 workers die, round-2 workers resume
from their checkpoint).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_generation(tmp_path, mode, port):
    outs = [str(tmp_path / f"{mode}_p{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outs[i],
             str(tmp_path / "ckpt"), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


def _single_process_reference(num_steps=4):
    """The same 4 training steps, one process, one device."""
    from nflows_tpu.flows import SimpleRealNVP
    from nflows_tpu.training import create_train_state, make_train_step

    flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1, key=jax.random.key(0))
    optimizer = optax.sgd(1e-2)
    state = create_train_state(flow, optimizer)
    step = make_train_step(optimizer, donate=False)
    rng = np.random.default_rng(42)
    batches = rng.normal(size=(4, 64, 2)).astype(np.float32)
    losses = []
    for i in range(num_steps):
        state, metrics = step(state, jnp.asarray(batches[i]))
        losses.append(float(metrics["loss"]))
    return losses


@pytest.mark.slow
def test_two_process_dp_with_checkpoint_recovery(tmp_path):
    port = _free_port()
    # generation 1: distributed bootstrap, 2 DP steps, checkpoint
    gen1 = _run_generation(tmp_path, "fresh", port)
    assert gen1[0]["losses"] == pytest.approx(gen1[1]["losses"], abs=1e-6), \
        "processes disagree on the global loss"
    assert gen1[0]["step"] == 2

    # generation 2: FRESH processes restore the dead generation's
    # checkpoint and continue (steps 3-4)
    port2 = _free_port()
    gen2 = _run_generation(tmp_path, "resume", port2)
    assert gen2[0]["losses"] == pytest.approx(gen2[1]["losses"], abs=1e-6)
    assert gen2[0]["step"] == 4

    # the interrupted-and-recovered run must match an uninterrupted
    # single-process run step for step
    ref = _single_process_reference()
    combined = gen1[0]["losses"] + gen2[0]["losses"]
    assert combined == pytest.approx(ref, abs=1e-5), (combined, ref)
