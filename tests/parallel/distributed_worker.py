"""Multi-process DP worker: one JAX process of a 2-process x 2-device
CPU "cluster" (tests/parallel/test_multihost.py drives two of these).

Exercises the real multi-host path end to end:
``initialize_distributed`` (jax.distributed over a local coordinator,
parallel/mesh.py:69) -> global mesh over all processes' devices ->
GSPMD DP train steps on process-local data shards -> orbax checkpoint
save, and — in resume mode — restore-from-checkpoint in a FRESH pair of
processes (the round-1 processes are dead), continuing training.

Writes per-step losses to a JSON file the parent compares across
processes and against an uninterrupted single-process reference.

Usage: python distributed_worker.py <proc_id> <num_procs> <port> \
           <out_json> <ckpt_dir> <mode: fresh|resume>
"""

import json
import os
import sys

proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
out_json, ckpt_dir, mode = sys.argv[4], sys.argv[5], sys.argv[6]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from nflows_tpu.parallel import initialize_distributed  # noqa: E402

initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from nflows_tpu.flows import SimpleRealNVP  # noqa: E402
from nflows_tpu.parallel import make_mesh  # noqa: E402
from nflows_tpu.parallel.train import make_gspmd_train_step  # noqa: E402
from nflows_tpu.training import create_train_state  # noqa: E402
from nflows_tpu.training.checkpoint import (  # noqa: E402
    restore_checkpoint,
    save_checkpoint,
)

assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs  # global view spans processes

mesh = make_mesh(data=len(jax.devices()), model=1)
flow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                     num_blocks_per_layer=1, key=jax.random.key(0))
optimizer = optax.sgd(1e-2)
state = create_train_state(flow, optimizer)
step = make_gspmd_train_step(optimizer, mesh, donate=False)

if mode == "resume":
    # fresh processes, dead predecessors: restore their checkpoint
    state = restore_checkpoint(ckpt_dir, state)

# deterministic global batch, identical on every process; each process
# contributes its LOCAL shard via make_array_from_process_local_data
rng = np.random.default_rng(42)
global_batches = rng.normal(size=(4, 64, 2)).astype(np.float32)
sharding = NamedSharding(mesh, P("data", None))

start = 2 if mode == "resume" else 0
losses = []
for i in range(start, start + 2):
    gb = global_batches[i]
    local = np.array_split(gb, num_procs)[proc_id]
    batch = jax.make_array_from_process_local_data(sharding, local, gb.shape)
    state, metrics = step(state, batch)
    losses.append(float(metrics["loss"]))

if mode == "fresh":
    save_checkpoint(ckpt_dir, state)

with open(out_json, "w") as f:
    json.dump({"process": proc_id, "losses": losses,
               "step": int(state.step)}, f)
print("WORKER DONE", proc_id, losses, flush=True)
