"""Exponential moving average of a parameter pytree.

Functional equivalent of the reference's shadow-dict EMA
(`/root/reference/src/denoising_utils.py:163-205`): shadow = (1-mu)*param +
mu*shadow, started after ``ema_start`` iterations, with evaluation/sampling/
checkpoints performed under the EMA weights (`main.py:52-53,178-183,313-316`).

In JAX there is no in-place weight swap: we keep two explicit pytrees
(raw ``params`` and ``ema_params``) and the caller selects which to apply —
this replicates the reference's apply/restore semantics without mutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """Register: shadow starts as a copy of the parameters
    (`denoising_utils.py:169-172`). Must be a real copy — aliased buffers
    break donation in the jitted train step."""
    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(ema_params, params, mu: float = 0.99):
    """shadow <- (1-mu) * param + mu * shadow (`denoising_utils.py:174-177`)."""
    return jax.tree_util.tree_map(
        lambda s, p: (1.0 - mu) * p + mu * s, ema_params, params
    )


def ema_update_after(ema_params, params, step, mu: float = 0.99, ema_start: int = 1000):
    """jit-friendly conditional update: identity until step > ema_start
    (`main.py:178-179`)."""
    do = (step > ema_start).astype(jnp.float32)
    # effective decay: mu' = 1 when not yet started (keep shadow == snapshot
    # of params at start handled by re-snapshot below)
    new = jax.tree_util.tree_map(lambda s, p: (1.0 - mu) * p + mu * s, ema_params, params)
    keep_params = jax.tree_util.tree_map(jnp.asarray, params)
    return jax.tree_util.tree_map(
        lambda n, p: do * n + (1.0 - do) * p, new, keep_params
    )
