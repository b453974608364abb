"""Neural density estimators: MixtureOfGaussiansMADE
(reference: nflows/nn/nde/made.py:284-427).

A MADE with 3·K outputs per feature (mixture logit, mean, unconstrained
std). ``log_prob`` is one parallel pass + logsumexp; ``sample`` is the
sequential per-feature pass, here a ``lax.fori_loop`` whose body does one
MADE forward, a categorical draw, and a gaussian draw — all on-device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nflows_tpu.core.module import static
from nflows_tpu.nn.made import MADE
from nflows_tpu.nn.primitives import ensure_key
from nflows_tpu.utils import shapes as shapeutils

__all__ = ["MixtureOfGaussiansMADE"]


class MixtureOfGaussiansMADE(MADE):
    """MADE whose outputs parameterize a per-feature mixture of Gaussians."""

    num_mixture_components: int = static()
    epsilon: float = static()

    def __init__(self, features, hidden_features, context_features=None,
                 num_blocks=2, num_mixture_components=5,
                 use_residual_blocks=True, random_mask=False, key=None,
                 activation=jax.nn.relu, dropout_probability=0.0,
                 use_batch_norm=False, epsilon=1e-2,
                 custom_initialization=True, rng=None):
        if use_residual_blocks and random_mask:
            raise ValueError("Residual blocks can't be used with random masks.")
        key = ensure_key(key)
        init_key, made_key = jax.random.split(key)
        super().__init__(
            features, hidden_features,
            context_features=context_features,
            num_blocks=num_blocks,
            output_multiplier=3 * num_mixture_components,
            use_residual_blocks=use_residual_blocks,
            random_mask=random_mask,
            key=made_key,
            activation=activation,
            dropout_probability=dropout_probability,
            use_batch_norm=use_batch_norm,
            rng=rng,
        )
        self.num_mixture_components = num_mixture_components
        self.epsilon = epsilon
        if custom_initialization:
            self._custom_initialize(init_key)

    def _custom_initialize(self, key):
        """Near-uniform mixture coefficients, stds near 1 at init
        (reference nde/made.py:390-427). Our Dense weight is [in, out], so
        the strided output slots are columns."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        eps = self.epsilon
        n_out = self.features * self.num_mixture_components
        w = self.final_layer.weight
        b = self.final_layer.bias
        # logits: slots 0::3
        w = w.at[:, 0::3].set(eps * jax.random.normal(k1, (w.shape[0], n_out)))
        b = b.at[0::3].set(eps * jax.random.normal(k2, (n_out,)))
        # unconstrained stds: slots 2::3, softplus^-1(1 - eps) + noise
        w = w.at[:, 2::3].set(eps * jax.random.normal(k3, (w.shape[0], n_out)))
        constant = float(np.log(np.exp(1 - eps) - 1))
        b = b.at[2::3].set(constant + eps * jax.random.normal(k4, (n_out,)))
        # still inside __init__, so plain reassignment is allowed
        self.final_layer = self.final_layer.replace(weight=w, bias=b)

    def _mixture_params(self, outputs, batch_shape):
        outputs = outputs.reshape(*batch_shape, self.num_mixture_components, 3)
        logits = outputs[..., 0]
        means = outputs[..., 1]
        unconstrained_stds = outputs[..., 2]
        log_mixture_coefficients = jax.nn.log_softmax(logits, axis=-1)
        stds = jax.nn.softplus(unconstrained_stds) + self.epsilon
        return log_mixture_coefficients, means, stds

    def log_prob(self, inputs, context=None):
        outputs = self(inputs, context)
        log_coef, means, stds = self._mixture_params(outputs, inputs.shape)
        log_prob = jnp.sum(
            jax.scipy.special.logsumexp(
                log_coef - 0.5 * (
                    np.log(2 * np.pi)
                    + 2 * jnp.log(stds)
                    + ((inputs[..., None] - means) / stds) ** 2
                ),
                axis=-1,
            ),
            axis=-1,
        )
        return log_prob

    def sample(self, key, num_samples, context=None):
        """Sequential per-feature ancestral sampling
        (reference nde/made.py:355-388)."""
        if context is not None:
            context = shapeutils.repeat_rows(context, num_samples)
            total = context.shape[0]
        else:
            total = num_samples

        samples0 = jnp.zeros((total, self.features))

        def body(feature, samples):
            outputs = self(samples, context)
            log_coef, means, stds = self._mixture_params(outputs, samples.shape)
            f_logits = log_coef[:, feature, :]
            f_means = means[:, feature, :]
            f_stds = stds[:, feature, :]
            kf = jax.random.fold_in(key, feature)
            kcat, knorm = jax.random.split(kf)
            comp = jax.random.categorical(kcat, f_logits, axis=-1)
            onehot = jax.nn.one_hot(comp, self.num_mixture_components,
                                    dtype=samples.dtype)
            mean = jnp.sum(f_means * onehot, axis=-1)
            std = jnp.sum(f_stds * onehot, axis=-1)
            value = mean + jax.random.normal(knorm, (total,)) * std
            return samples.at[:, feature].set(value)

        samples = jax.lax.fori_loop(0, self.features, body, samples0)
        samples = jax.lax.stop_gradient(samples)
        if context is not None:
            return samples.reshape(-1, num_samples, self.features)
        return samples
