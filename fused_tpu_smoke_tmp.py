import sys
import jax, jax.numpy as jnp, numpy as np
from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_fused import fuse_nsf

lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 512
flow = NeuralSplineFlow(features=6, hidden_features=256, num_layers=10,
                        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
                        key=jax.random.key(0), rng=np.random.default_rng(0))
x = jnp.asarray(np.random.default_rng(1).normal(size=(2048, 6)) * 2, dtype=jnp.float32)
z = jnp.asarray(np.random.default_rng(2).normal(size=(2048, 6)), dtype=jnp.float32)
y_ref, lad_ref = jax.jit(flow.transform.forward)(x)
x_ref, ladi_ref = jax.jit(flow.transform.inverse)(z)
fused16 = fuse_nsf(flow, lanes=lanes)
y16, lad16 = fused16.forward(x)
print(f"lanes={lanes} bf16@256 fwd out err", float(jnp.max(jnp.abs(y_ref - y16))), flush=True)
print("bf16@256 fwd lad err", float(jnp.max(jnp.abs(lad_ref - lad16))), flush=True)
x16, _ = fused16.inverse(z)
print("bf16@256 inv out err", float(jnp.max(jnp.abs(x_ref - x16))), flush=True)
print("SMOKE PASS", flush=True)
