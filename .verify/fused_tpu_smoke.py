import jax, jax.numpy as jnp, numpy as np
print(jax.devices())
from nflows_tpu.models import NeuralSplineFlow
from nflows_tpu.ops.pallas.nsf_fused import fuse_nsf

flow = NeuralSplineFlow(features=6, hidden_features=256, num_layers=10,
                        num_blocks_per_layer=2, num_bins=8, tail_bound=3.0,
                        key=jax.random.key(0), rng=np.random.default_rng(0))
fused32 = fuse_nsf(flow, dtype=jnp.float32)
x = jnp.asarray(np.random.default_rng(1).normal(size=(2048, 6)) * 2, dtype=jnp.float32)
y_ref, lad_ref = jax.jit(flow.transform.forward)(x)
y_f, lad_f = fused32.forward(x)
print("fp32 fwd out err", float(jnp.max(jnp.abs(y_ref - y_f))))
print("fp32 fwd lad err", float(jnp.max(jnp.abs(lad_ref - lad_f))))
z = jnp.asarray(np.random.default_rng(2).normal(size=(2048, 6)), dtype=jnp.float32)
x_ref, ladi_ref = jax.jit(flow.transform.inverse)(z)
x_f, ladi_f = fused32.inverse(z)
print("fp32 inv out err", float(jnp.max(jnp.abs(x_ref - x_f))))
print("fp32 inv lad err", float(jnp.max(jnp.abs(ladi_ref - ladi_f))))

fused16 = fuse_nsf(flow)  # bf16
y16, lad16 = fused16.forward(x)
print("bf16 fwd out err vs fp32 ref", float(jnp.max(jnp.abs(y_ref - y16))))
x16, ladi16 = fused16.inverse(z)
print("bf16 inv out err vs fp32 ref", float(jnp.max(jnp.abs(x_ref - x16))))
print("SMOKE PASS")
