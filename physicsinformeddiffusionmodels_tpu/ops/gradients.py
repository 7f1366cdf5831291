"""Jacobian / Hessian helpers (numeric + autodiff).

API-parity layer for the reference's ``GradientsHelper``
(`/root/reference/src/grad_utils.py:177-291`): central-difference numeric
jacobians/hessians for verification, batched autodiff jacobians/hessians via
vmap(jacfwd/jacrev), and the FD image jacobian built on the stencil
operators. In JAX these are thin compositions of native transforms.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.ops.fd import StencilGradients


def jacobian_numeric(func: Callable, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Central-difference jacobian over the last axis of ``x``
    (`grad_utils.py:186-219`). Shape [*out_shape, x.shape[-1]]."""
    dim = x.shape[-1]

    def column(i):
        d = jnp.zeros_like(x).at[..., i].set(eps)
        return (func(x + d) - func(x - d)) / (2 * eps)

    cols = [column(i) for i in range(dim)]
    return jnp.stack(cols, axis=-1)


def hessian_numeric(func: Callable, x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Forward-difference Hessian (`grad_utils.py:221-245`)."""
    dim = x.shape[-1]
    f0 = func(x)

    def entry(i, j):
        di = jnp.zeros_like(x).at[..., i].set(eps)
        dj = jnp.zeros_like(x).at[..., j].set(eps)
        return (func(x + di + dj) - func(x + di) - func(x + dj) + f0) / eps**2

    rows = [jnp.stack([entry(i, j) for j in range(dim)], axis=-1) for i in range(dim)]
    return jnp.stack(rows, axis=-2)


def jacobian_autodiff(func: Callable, x: jax.Array, mode: str = "rev", batched: bool = False):
    """vmap-batched autodiff jacobian (`grad_utils.py:269-283`)."""
    ad = jax.jacrev if mode == "rev" else jax.jacfwd
    return jax.vmap(ad(func))(x) if batched else ad(func)(x)


def hessian_autodiff(func: Callable, x: jax.Array, batched: bool = False):
    """jacfwd(jacrev(f)) Hessian (`grad_utils.py:285-291`)."""
    h = jax.jacfwd(jax.jacrev(func))
    return jax.vmap(h)(x) if batched else h(x)


def image_jacobian(grads: StencilGradients, tensor: jax.Array) -> jax.Array:
    """Spatial FD jacobian of an image stacked on a new leading-of-pixel axis
    (`grad_utils.py:247-267`)."""
    return jnp.stack([grads.d_d0(tensor), grads.d_d1(tensor)], axis=-3)
