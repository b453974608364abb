import jax, jax.numpy as jnp, numpy as np
from nflows_tpu.ops import splines
from nflows_tpu.ops.pallas.quadratic_spline import quadratic_spline_pallas

N = 262144
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N,)) * 2.5, jnp.float32)
p = jnp.asarray(rng.normal(size=(N, 8)), jnp.float32)
h7 = jnp.asarray(rng.normal(size=(N, 7)), jnp.float32)

o1, l1 = jax.jit(lambda: splines.unconstrained_quadratic_spline(x, p, h7, inverse=True, tails="linear", tail_bound=3.0))()
o2, l2 = jax.jit(lambda: quadratic_spline_pallas(x, p, h7, inverse=True, tail_bound=3.0))()
d = np.abs(np.asarray(l1) - np.asarray(l2))
i = int(np.argmax(d))
print("worst idx", i, "x", float(x[i]), flush=True)
print("TPU: ref lad", float(l1[i]), " pal lad", float(l2[i]), " ref out", float(o1[i]), " pal out", float(o2[i]), flush=True)
np.savez("/tmp/dbg_elem.npz", x=np.asarray(x[i:i+1]), p=np.asarray(p[i:i+1]), h=np.asarray(h7[i:i+1]))
# also check the XLA cubic-inv NaN claim
dl = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
dr = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
oc, lc = jax.jit(lambda: splines.unconstrained_cubic_spline(x, p, p, dl, dr, inverse=True, tails="linear", tail_bound=3.0))()
print("XLA cubic-inv NaNs on TPU:", int(jnp.sum(jnp.isnan(oc) | jnp.isnan(lc))), flush=True)
