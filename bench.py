"""Headline benchmark: RQ-NSF coupling flow training throughput.

Config mirrors the NSF paper's UCI-POWER scale (features=6, hidden=256,
10 coupling layers, 2 residual blocks, 8 bins, batch 512) — the flagship
workload of both the reference library and this framework.

Baseline: the reference implementation (bayesiains/nflows @ /root/reference,
pure PyTorch) running the *identical* model/config on this host's CPU with
8 torch threads measured 2026-08-16: 3.66 steps/s (273 ms/step). The
reference has no GPU/TPU path — torch-CPU is the reference's own shipped
performance; see BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_STEPS_PER_S = 3.661  # reference torch-CPU, same config, this host


def main():
    import jax
    import jax.numpy as jnp
    import optax

    # Standard TPU training configuration: bf16 MXU matmuls, fp32 accumulate
    # (spline/logdet numerics stay fp32 elementwise). See config.py.
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import create_train_state, make_train_step

    FEATURES, HIDDEN, LAYERS, BLOCKS, BINS, BATCH = 6, 256, 10, 2, 8, 512

    flow = NeuralSplineFlow(
        features=FEATURES, hidden_features=HIDDEN, num_layers=LAYERS,
        num_blocks_per_layer=BLOCKS, num_bins=BINS, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0),
    )
    optimizer = optax.adam(3e-4)
    state = create_train_state(flow, optimizer)
    step = make_train_step(optimizer)

    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.normal(size=(BATCH, FEATURES)), dtype=jnp.float32)

    # warmup: compile + a few steady-state steps
    for _ in range(5):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])

    N = 200
    t0 = time.perf_counter()
    for _ in range(N):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_s = N / dt
    print(json.dumps({
        "metric": "rq_nsf_coupling_train_steps_per_s(features=6,hidden=256,layers=10,batch=512)",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
