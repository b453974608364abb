"""Single-chip training loop building blocks.

The reference is a library whose users hand-write torch training loops
(reference examples/moons.ipynb: ``loss = -flow.log_prob(x).mean();
loss.backward(); optimizer.step()``). Here the equivalent is a *jitted*
``train_step`` closed over an optax optimizer: one compiled XLA program per
step containing the forward, the backward, and the Adam update — no Python
in the hot loop. For the multi-chip version see nflows_tpu/parallel/.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from nflows_tpu.core.module import Module, combine, partition

__all__ = ["TrainState", "create_train_state", "make_train_step", "nll_loss"]


class TrainState(Module):
    """Carries (trainable params, non-trainable rest, optimizer state, step).

    ``combine(state.params, state.rest)`` reconstitutes the flow.
    """

    params: Any
    rest: Any
    opt_state: Any
    step: jnp.ndarray

    def __init__(self, params, rest, opt_state, step=None):
        self.params = params
        self.rest = rest
        self.opt_state = opt_state
        self.step = jnp.zeros((), dtype=jnp.int32) if step is None else step

    @property
    def flow(self):
        return combine(self.params, self.rest)


def create_train_state(flow, optimizer: optax.GradientTransformation) -> TrainState:
    params, rest = partition(flow)
    opt_state = optimizer.init(params)
    return TrainState(params, rest, opt_state)


def nll_loss(flow, batch, context=None):
    """Maximum-likelihood loss: mean negative log-probability."""
    return -jnp.mean(flow.log_prob(batch, context))


def make_train_step(
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = nll_loss,
    jit: bool = True,
    donate: bool = True,
    remat: bool = False,
):
    """Build ``step(state, batch, context=None) -> (new_state, metrics)``.

    The state is donated to the compiled program so parameter and optimizer
    buffers update in place in HBM (no copy per step). ``remat=True`` wraps
    the loss in ``jax.checkpoint`` so the backward pass recomputes
    activations instead of storing every layer — trades FLOPs for HBM on
    deep flows.
    """

    def step(state: TrainState, batch, context=None, key=None):
        def compute_loss(params):
            flow = combine(params, state.rest)
            if key is not None:
                from nflows_tpu.core.stochastic import stochastic
                with stochastic(key):
                    return loss_fn(flow, batch, context)
            return loss_fn(flow, batch, context)

        if remat:
            compute_loss = jax.checkpoint(compute_loss)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        metrics = {"loss": loss}
        return new_state, metrics

    if jit:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())
    return step


def make_scan_train_step(
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = nll_loss,
    donate: bool = True,
    remat: bool = False,
):
    """Build ``steps(state, batches, key=None) -> (new_state, metrics)``
    running one ``lax.scan`` over a leading minibatch axis: ``batches`` is
    [num_steps, batch, ...]. The whole window is ONE compiled program — no
    per-step host dispatch, the standard TPU train-loop-in-jit pattern.
    Returns per-step losses [num_steps]. Pass ``key`` to activate dropout
    (each scanned step folds the step counter into it, same stream contract
    as make_train_step's ``key``). ``remat=True`` checkpoints each step's
    loss (same trade as make_train_step's flag: recompute activations in
    the backward instead of storing them — for deep flows whose per-step
    residuals would not fit HBM at large batch).
    """

    def steps(state: TrainState, batches, key=None):
        def one(state: TrainState, batch):
            def compute_loss(params):
                flow = combine(params, state.rest)
                if key is None:
                    return loss_fn(flow, batch, None)
                # per-step dropout stream: fold the (traced) step counter in
                from nflows_tpu.core.stochastic import stochastic
                with stochastic(jax.random.fold_in(key, state.step)):
                    return loss_fn(flow, batch, None)

            if remat:
                compute_loss = jax.checkpoint(compute_loss)
            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(
                params=new_params, opt_state=new_opt_state, step=state.step + 1
            ), loss

        return jax.lax.scan(one, state, batches)

    return jax.jit(steps, donate_argnums=(0,) if donate else ())
