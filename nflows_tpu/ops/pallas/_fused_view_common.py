"""Shared serving surface for the fused inference views.

``FusedFlowView`` owns everything identical between the coupling view
(nsf_fused.FusedNSF) and the AR view (maf_fused.FusedMAF): context
embedding/validation, lane padding around the kernel call, the Transform
contract (forward/inverse), and the Distribution contract (log_prob /
sample / sample_and_log_prob, with the conditional key-stream matching
Flow._sample — flows/base.py:72-99 — sample-for-sample).

Exists for the same reason as ``_trainer_common.FusedTrainerBase``: this
code was once copy-pasted between the two views, so a fix to e.g. the
conditional noise layout had to land twice or the endpoints diverged.

Subclasses set in ``__init__``: ``features``, ``context_features``,
``_embedding_net``, ``_lanes``, ``_interpret``; and implement
``_build_runners()`` which must bind ``_run_fwd`` / ``_run_inv`` as
``(x_t, ctx_t) -> (y_t, lad)`` jitted kernel calls.
"""

from __future__ import annotations

import copy

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["FusedFlowView"]


class FusedFlowView:
    """Common fused-view endpoints; see nsf_fused/maf_fused for usage."""

    def _build_runners(self):
        raise NotImplementedError

    def _embed(self, context):
        if context is None or self._embedding_net is None:
            return context
        return self._embedding_net(context)

    def with_lanes(self, lanes: int):
        """A view of the same extracted weights with a different lane tile
        (no re-extraction/host transfer). Ragged batches pad up to one lane
        tile, so size the tile to the request shape."""
        view = copy.copy(self)
        view._lanes = lanes
        view._build_runners()
        return view

    # -- transform contract ------------------------------------------------

    def _check_context(self, context, n):
        if self.context_features is None:
            if context is not None:
                raise ValueError(
                    "this flow was fused without context support but a "
                    "context was passed")
            return None
        if context is None:
            raise ValueError(
                "this flow is conditional; a context of shape "
                f"[N, ...] matching the {n} inputs is required")
        if context.shape[0] != n:
            raise ValueError(
                f"context has {context.shape[0]} rows but inputs have {n}")
        return context

    def _apply(self, inputs, inverse, embedded_context=None):
        n = inputs.shape[0]
        if inputs.ndim != 2 or inputs.shape[1] != self.features:
            raise ValueError(
                f"expected [N, {self.features}] inputs, got {inputs.shape}")
        pad = (-n) % self._lanes
        x_t = jnp.asarray(inputs, jnp.float32).T
        ctx_t = None
        if embedded_context is not None:
            ctx_t = jnp.asarray(embedded_context, jnp.float32).T
        if pad:
            x_t = jnp.pad(x_t, ((0, 0), (0, pad)))
            if ctx_t is not None:
                ctx_t = jnp.pad(ctx_t, ((0, 0), (0, pad)))
        run = self._run_inv if inverse else self._run_fwd
        y_t, lad = run(x_t, ctx_t)
        return y_t[:, :n].T, lad[0, :n]

    def forward(self, inputs, context=None):
        context = self._check_context(context, inputs.shape[0])
        return self._apply(inputs, inverse=False,
                           embedded_context=self._embed(context))

    def inverse(self, inputs, context=None):
        context = self._check_context(context, inputs.shape[0])
        return self._apply(inputs, inverse=True,
                           embedded_context=self._embed(context))

    # -- distribution contract ---------------------------------------------

    def log_prob(self, inputs, context=None):
        noise, logabsdet = self.forward(inputs, context)
        log_base = -0.5 * jnp.sum(noise ** 2, axis=1) \
            - 0.5 * self.features * np.log(2 * np.pi)
        return log_base + logabsdet

    def _conditional_noise(self, key, num_samples, embedded):
        """Noise + repeated context in the exact layout/key-stream of
        Flow._sample's context-free-base branch (flows/base.py:72-99), so
        fused and XLA endpoints agree sample-for-sample."""
        from nflows_tpu.utils import shapes as shapeutils

        m = embedded.shape[0]
        noise = jax.random.normal(key, (num_samples * m, self.features))
        ctx_rep = shapeutils.repeat_rows(embedded, num_reps=num_samples)
        return noise, ctx_rep

    def _sample_conditional(self, key, num_samples, context):
        """Shared conditional-sampling body: returns ([M, n, D] samples,
        [M, n] log probs). Conditionality mismatch raises via
        _check_context's wording (n = rows of the repeated context)."""
        if self.context_features is None:
            raise ValueError(
                "this flow was fused without context support but a "
                "context was passed")
        embedded = self._embed(context)
        noise, ctx_rep = self._conditional_noise(key, num_samples, embedded)
        samples, logabsdet = self._apply(noise, inverse=True,
                                         embedded_context=ctx_rep)
        log_base = -0.5 * jnp.sum(noise ** 2, axis=1) \
            - 0.5 * self.features * np.log(2 * np.pi)
        m = context.shape[0]
        return (samples.reshape(m, num_samples, self.features),
                (log_base - logabsdet).reshape(m, num_samples))

    def sample(self, key, num_samples, context=None):
        if context is None:
            self._check_context(None, num_samples)
            noise = jax.random.normal(key, (num_samples, self.features))
            samples, _ = self._apply(noise, inverse=True)
            return samples
        return self._sample_conditional(key, num_samples, context)[0]

    def sample_and_log_prob(self, key, num_samples, context=None):
        if context is None:
            self._check_context(None, num_samples)
            noise = jax.random.normal(key, (num_samples, self.features))
            samples, logabsdet = self._apply(noise, inverse=True)
            log_base = -0.5 * jnp.sum(noise ** 2, axis=1) \
                - 0.5 * self.features * np.log(2 * np.pi)
            return samples, log_base - logabsdet
        return self._sample_conditional(key, num_samples, context)
