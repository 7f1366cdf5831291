"""Generic jit-compiled training step with EMA and gradient clipping.

Equivalent of the reference train-loop body (`/root/reference/main.py:156-179`):
Adam(lr=1e-4) + global-norm clip 1.0, EMA (mu=0.99) starting after iteration
1000. In JAX the whole step — loss, backward through denoiser + physics
residual, optimizer update, EMA lerp — is one fused XLA program with donated
input buffers (no reallocation per step).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import optax

from physicsinformeddiffusionmodels_tpu.diffusion.ema import ema_init, ema_update_after


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array


def make_optimizer(learning_rate: float = 1e-4, grad_clip: float = 1.0):
    """Adam + global-norm clipping (`main.py:143,165`)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(learning_rate),
    )


def create_train_state(params, tx) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=ema_init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    loss_fn: Callable,
    tx,
    ema_mu: float = 0.99,
    ema_start: int = 1000,
    donate: bool = True,
):
    """Build a jitted train step.

    ``loss_fn(params, batch, key, step) -> (loss, aux)`` must be pure.
    Returns ``step_fn(state, batch, key) -> (state, aux)``.
    """

    def step_fn(state: TrainState, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, batch, key, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update_after(
            state.ema_params, params, state.step, mu=ema_mu, ema_start=ema_start
        )
        return (
            TrainState(params, opt_state, ema_params, state.step + 1),
            aux,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
