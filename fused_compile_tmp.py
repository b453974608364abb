import time, sys
import jax, jax.numpy as jnp, numpy as np
from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_fused import fuse_nsf

flow = NeuralSplineFlow(features=6, hidden_features=256, num_layers=10,
                        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
                        key=jax.random.key(0), rng=np.random.default_rng(0))
fused = fuse_nsf(flow, lanes=1024)
x_t = jnp.zeros((6, 1024), jnp.float32)
t0 = time.time()
lowered = fused._run_fwd.lower(x_t)
print("lowered in", round(time.time()-t0, 1), "s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print("compiled in", round(time.time()-t0, 1), "s", flush=True)
t0 = time.time()
y, lad = compiled(x_t)
print("ran in", round(time.time()-t0, 1), "s; y0:", float(y[0,0]), flush=True)
print("COMPILE PROBE DONE", flush=True)
