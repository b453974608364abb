"""Unconstrained Monotonic Neural Network transforms
(reference: nflows/transforms/UMNN/MonotonicNormalizer.py:11-81).

The reference delegates the quadrature to the external pip package ``UMNN``
(NeuralIntegral / ParallelNeuralIntegral); here Clenshaw–Curtis quadrature
is implemented natively: nodes/weights are host-computed constants for the
static step count, so the integral is a single batched evaluation of the
integrand net at ``nb_steps+1`` points — one fused set of GEMMs on the MXU
— followed by a weighted sum. Gradients come from plain autodiff (JAX remat
replaces the reference's Leibniz-rule memory trick).

The inverse is the reference's 25-step bisection on [-20, 20]
(MonotonicNormalizer.py:66-81), expressed as a ``fori_loop``.

Conditioning layout: ``h`` is [batch, dim, cond_size]; channel 0 doubles as
the additive offset z0 (MonotonicNormalizer.py:53).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.transforms.base import Transform
from nflows_tpu.core.module import Module, static
from nflows_tpu.nn.primitives import Dense, ensure_key

__all__ = ["IntegrandNet", "MonotonicNormalizer",
           "UnconditionalMonotonicTransform", "cc_nodes_weights"]


def cc_nodes_weights(num_steps: int):
    """Clenshaw–Curtis nodes/weights on [-1, 1] with num_steps+1 nodes."""
    N = num_steps
    k = np.arange(N + 1)
    nodes = np.cos(np.pi * k / N)
    weights = np.zeros(N + 1)
    for i in range(N + 1):
        s = 1.0
        for j in range(1, N // 2 + 1):
            b = 1.0 if (2 * j == N) else 2.0
            s -= b * np.cos(2 * j * np.pi * i / N) / (4 * j * j - 1)
        weights[i] = 2.0 / N * s
    weights[0] /= 2.0
    weights[-1] /= 2.0
    return nodes.astype(np.float32), weights.astype(np.float32)


class IntegrandNet(Module):
    """Positive integrand MLP: per-dim input [x_d, h_d] -> ELU(x)+1
    (reference MonotonicNormalizer.py:20-37)."""

    layers: tuple

    def __init__(self, hidden: Sequence[int], cond_in: int, key=None):
        key = ensure_key(key)
        sizes_in = [1 + cond_in] + list(hidden)
        sizes_out = list(hidden) + [1]
        keys = jax.random.split(key, len(sizes_in))
        self.layers = tuple(
            Dense(i, o, key=k) for i, o, k in zip(sizes_in, sizes_out, keys)
        )

    def __call__(self, x, h):
        """x: [B, D]; h: [B, D, cond] -> positive integrand values [B, D]."""
        inp = jnp.concatenate([x[..., None], h], axis=-1)  # [B, D, 1+cond]
        out = inp
        for layer in self.layers[:-1]:
            out = jax.nn.relu(layer(out))
        out = self.layers[-1](out)
        return (jax.nn.elu(out) + 1.0)[..., 0]


class MonotonicNormalizer(Module):
    """Monotone map z(x) = ∫₀ˣ f(t, h) dt + h[..., 0] with positive f."""

    integrand_net: IntegrandNet
    nb_steps: int = static()
    solver: str = static()

    def __init__(self, integrand_net, cond_size, nb_steps=20, solver="CCParallel",
                 key=None):
        if isinstance(integrand_net, (list, tuple)):
            self.integrand_net = IntegrandNet(integrand_net, cond_size, key=key)
        else:
            self.integrand_net = integrand_net
        self.nb_steps = nb_steps
        # CC vs CCParallel only differ in the reference's memory strategy;
        # the native quadrature is always the parallel (vectorized) form.
        self.solver = solver

    def _integrate(self, x0, xT, h):
        """Clenshaw–Curtis: ∫_{x0}^{xT} f(t, h) dt, elementwise over [B, D].

        Also returns f(xT, h): node 0 is cos(0) = 1, i.e. ts[0] == xT, so
        the quadrature already evaluated the integrand there — callers reuse
        it as the jacobian instead of paying another IntegrandNet pass."""
        nodes, weights = cc_nodes_weights(self.nb_steps)
        half_len = (xT - x0) / 2.0
        center = (xT + x0) / 2.0
        # evaluate integrand at all nodes: [S+1, B, D]
        ts = center[None, ...] + half_len[None, ...] * jnp.asarray(nodes)[:, None, None]
        f = jax.vmap(lambda t: self.integrand_net(t, h))(ts)
        return half_len * jnp.tensordot(jnp.asarray(weights), f, axes=(0, 0)), f[0]

    def forward(self, x, h, context=None):
        """Returns (z, jac) with jac = f(x, h) = dz/dx
        (reference MonotonicNormalizer.py:49-64)."""
        x0 = jnp.zeros_like(x)
        # cond_size=0 (unconditional normalizer): no offset channel
        z0 = h[:, :, 0] if h.shape[-1] > 0 else jnp.zeros_like(x)
        integral, f_end = self._integrate(x0, x, h)
        return integral + z0, f_end

    def __call__(self, x, h, context=None):
        return self.forward(x, h, context)

    def inverse_transform(self, z, h, context=None):
        """25-step bisection on [-20, 20] (MonotonicNormalizer.py:66-81)."""
        x_max = jnp.ones_like(z) * 20.0
        x_min = -jnp.ones_like(z) * 20.0

        def body(_, carry):
            x_min, x_max = carry
            x_middle = (x_max + x_min) / 2.0
            z_middle, _ = self.forward(x_middle, h, context)
            left = (z_middle > z).astype(z.dtype)
            right = 1.0 - left
            x_max = left * x_middle + right * x_max
            x_min = right * x_middle + left * x_min
            return x_min, x_max

        x_min, x_max = jax.lax.fori_loop(0, 25, body, (x_min, x_max))
        return (x_max + x_min) / 2.0


class UnconditionalMonotonicTransform(Transform):
    """A MonotonicNormalizer with cond_size=0 packaged as a Transform — the
    analogue of the reference's ``apply_unconditional_transform=True`` path
    for UMNN couplings (reference coupling.py:171-173, which builds a
    ``MonotonicNormalizer(integrand_net_layers, 0, ...)`` for the identity
    half). Per-feature monotone map, no conditioning."""

    normalizer: MonotonicNormalizer
    features: int = static()

    def __init__(self, features, integrand_net_layers=(50, 50, 50),
                 nb_steps=20, solver="CCParallel", key=None):
        self.features = features
        self.normalizer = MonotonicNormalizer(
            list(integrand_net_layers), 0, nb_steps=nb_steps, solver=solver,
            key=key)

    def _h(self, x):
        return jnp.zeros((*x.shape, 0), dtype=x.dtype)

    def forward(self, inputs, context=None):
        z, jac = self.normalizer.forward(inputs, self._h(inputs))
        return z, jnp.sum(jnp.log(jac), axis=tuple(range(1, inputs.ndim)))

    def inverse(self, inputs, context=None):
        h = self._h(inputs)
        x = self.normalizer.inverse_transform(inputs, h)
        _, jac = self.normalizer.forward(x, h)
        return x, -jnp.sum(jnp.log(jac), axis=tuple(range(1, inputs.ndim)))
