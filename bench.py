"""Headline benchmark: RQ-NSF coupling flow training throughput.

Config mirrors the NSF paper's UCI-POWER scale (features=6, hidden=256,
10 coupling layers, 2 residual blocks, 8 bins, batch 512) — the flagship
workload of both the reference library and this framework.

Measured as a production TPU training loop: ``lax.scan`` windows of 1000
minibatches per dispatch (training/train.py:make_scan_train_step), bf16 MXU
matmuls with fp32 accumulation. Timing spans dispatch -> scalar fetch of the
final loss (which data-depends on every step): on this image's remote TPU
backend, ``block_until_ready`` alone can return before execution completes
(see benchmarks/_timing.py), so only a value fetch is a sound fence. The
~50 ms fetch round-trip is amortized to <2% by the 4000-step chain.

Baseline: the reference implementation (bayesiains/nflows @ /root/reference,
pure PyTorch — its only execution path) running the identical model/config
on this host's CPU with 8 torch threads, measured 2026-08-16: 3.661 steps/s
(273 ms/step, 20 steps timed after warmup). See BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import signal
import sys
import time

import numpy as np

REFERENCE_STEPS_PER_S = 3.661  # reference torch-CPU, same config, this host

# A healthy run (compile + 5 windows + fetches) completes in ~2-3 min on
# the TPU. A wedged device tunnel hangs ops indefinitely (observed: a
# stuck remote compile blocks every subsequent op for 10+ hours), so fail
# fast and loud instead of eating the caller's whole time budget. stderr
# only — stdout stays reserved for the single JSON result line.
DEADLINE_S = 900


def _deadline(signum, frame):
    print(
        "bench.py: exceeded %ds deadline — device backend is likely "
        "wedged (no result produced)" % DEADLINE_S,
        file=sys.stderr, flush=True,
    )
    sys.exit(3)


def main():
    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(DEADLINE_S)
    import jax
    import jax.numpy as jnp
    import optax

    # Standard TPU training configuration: bf16 MXU matmuls, fp32 accumulate
    # (spline/logdet numerics stay fp32 elementwise). See config.py.
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from nflows_tpu.models import NeuralSplineFlow
    from nflows_tpu.training import create_train_state
    from nflows_tpu.training.train import make_scan_train_step

    FEATURES, HIDDEN, LAYERS, BLOCKS, BINS, BATCH = 6, 256, 10, 2, 8, 512
    INNER, OUTER = 1000, 4

    # stacked=True: the layer chain runs as one lax.scan over layer-stacked
    # params (transforms/stacked.py) — measured +18% steps/s over the
    # unrolled chain and ~50x faster compile (benchmarks/bench_stacked.py)
    flow = NeuralSplineFlow(
        features=FEATURES, hidden_features=HIDDEN, num_layers=LAYERS,
        num_blocks_per_layer=BLOCKS, num_bins=BINS, tail_bound=3.0,
        key=jax.random.key(0), rng=np.random.default_rng(0), stacked=True,
    )
    optimizer = optax.adam(3e-4)
    state = create_train_state(flow, optimizer)
    steps = make_scan_train_step(optimizer)

    rng = np.random.default_rng(1)
    windows = [
        jnp.asarray(rng.normal(size=(INNER, BATCH, FEATURES)), dtype=jnp.float32)
        for _ in range(OUTER + 1)
    ]

    # warmup: compile + one full window, drained via value fetch
    state, losses = steps(state, windows[-1])
    float(losses[-1])

    t0 = time.perf_counter()
    for i in range(OUTER):
        state, losses = steps(state, windows[i])
    # the final loss data-depends on all OUTER*INNER steps; fetching its
    # value is the only sound execution fence on this backend
    float(losses[-1])
    dt = time.perf_counter() - t0

    signal.alarm(0)
    steps_per_s = OUTER * INNER / dt
    print(json.dumps({
        "metric": "rq_nsf_coupling_train_steps_per_s(features=6,hidden=256,layers=10,batch=512)",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
