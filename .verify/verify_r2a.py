"""User-style end-to-end verification on real TPU (axon)."""
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax

print("devices:", jax.devices())

from nflows_tpu.flows import MaskedAutoregressiveFlow, Flow
from nflows_tpu.training import create_train_state, make_train_step
from nflows_tpu.utils.datasets import make_moons

# 1. train MAF on moons
rng = np.random.default_rng(0)
X, y = make_moons(2**13, noise=0.1, rng=rng)
X = (X - X.mean(0)) / X.std(0)
flow = MaskedAutoregressiveFlow(features=2, hidden_features=32, num_layers=5,
                                num_blocks_per_layer=2, key=jax.random.key(0))
opt = optax.adam(3e-3)
state = create_train_state(flow, opt)
step = make_train_step(opt)
t0 = time.time()
for i in range(600):
    idx = rng.integers(0, X.shape[0], 256)
    state, m = step(state, jnp.asarray(X[idx], dtype=jnp.float32))
loss = float(m["loss"])
print(f"moons final NLL {loss:.4f}  ({time.time()-t0:.0f}s)")
assert loss < 2.4, loss

# 2. sample_and_log_prob consistency
s, lp = state.flow.sample_and_log_prob(jax.random.key(1), 512)
lp2 = state.flow.log_prob(s)
err = float(jnp.max(jnp.abs(lp - lp2)))
print("sample_and_log_prob max err", err)
assert err < 5e-3

# 3. RQ coupling chain round-trip under jit
from nflows_tpu.transforms import (CompositeTransform,
    PiecewiseRationalQuadraticCouplingTransform, ReversePermutation)
from nflows_tpu.nn import nets
def net(i, o):
    return nets.ResidualNet(i, o, hidden_features=64, num_blocks=2,
                            key=jax.random.key(42))
layers = []
for i in range(4):
    layers.append(ReversePermutation(6))
    layers.append(PiecewiseRationalQuadraticCouplingTransform(
        mask=np.array([1, 0] * 3) if i % 2 else np.array([0, 1] * 3),
        transform_net_create_fn=net, num_bins=8, tails="linear", tail_bound=3.0))
chain = CompositeTransform(layers)
x = jnp.asarray(np.random.default_rng(1).normal(size=(128, 6)), dtype=jnp.float32)
fwd = jax.jit(chain.forward); inv = jax.jit(chain.inverse)
z, ld = fwd(x)
x2, ldi = inv(z)
rt = float(jnp.max(jnp.abs(x - x2)))
ldsum = float(jnp.max(jnp.abs(ld + ldi)))
print("roundtrip err", rt, "logdet err", ldsum)
assert rt < 1e-4 and ldsum < 1e-3

# 4. conditional flow
from nflows_tpu.distributions import ConditionalDiagonalNormal
from nflows_tpu.nn.primitives import Dense
from nflows_tpu.transforms import MaskedAffineAutoregressiveTransform
keys = jax.random.split(jax.random.key(2), 6)
base = ConditionalDiagonalNormal([2], context_encoder=Dense(1, 4, key=keys[0]))
cl = []
for i in range(5):
    cl.append(ReversePermutation(2))
    cl.append(MaskedAffineAutoregressiveTransform(
        features=2, hidden_features=32, context_features=1, key=keys[i+1]))
cflow = Flow(CompositeTransform(cl), base)
ctx = jnp.asarray(y[:256, None], dtype=jnp.float32)
lp = cflow.log_prob(jnp.asarray(X[:256], dtype=jnp.float32), ctx)
assert lp.shape == (256,) and bool(jnp.all(jnp.isfinite(lp)))
cs = cflow.sample(jax.random.key(3), 64, context=jnp.asarray([[0.0], [1.0]]))
assert cs.shape == (2, 64, 2)
print("conditional ok")

# 5. clean-error probes
from nflows_tpu.transforms.base import InverseNotAvailable
from nflows_tpu.transforms.normalization import BatchNorm
import traceback
def expect(exc, fn):
    try:
        fn()
    except exc:
        return True
    except Exception:
        traceback.print_exc(); raise AssertionError(f"wrong exc, wanted {exc}")
    raise AssertionError(f"no error raised, wanted {exc}")
expect(ValueError, lambda: cflow.log_prob(jnp.ones((8, 2)), jnp.ones((4, 1))))
expect(ValueError, lambda: state.flow.log_prob(jnp.ones((8, 3))))
expect(InverseNotAvailable, lambda: BatchNorm(2).inverse(jnp.ones((4, 2))))
expect(TypeError, lambda: state.flow.sample(jax.random.key(0), -3))
print("error probes ok")

# 6. NEW this round: global-batch BatchNorm semantics on real TPU single
# chip is covered by CPU-mesh tests; here just exercise stats_axis=None path
from nflows_tpu.flows import SimpleRealNVP
bnflow = SimpleRealNVP(features=2, hidden_features=16, num_layers=2,
                       num_blocks_per_layer=1, key=jax.random.key(5),
                       batch_norm_within_layers=True,
                       batch_norm_between_layers=True)
lp = bnflow.log_prob(jnp.asarray(X[:128], dtype=jnp.float32))
assert bool(jnp.all(jnp.isfinite(lp)))
print("batchnorm flow ok")
print("VERIFY PASS")
