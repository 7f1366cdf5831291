"""Toy conditional MLP denoiser.

Flax re-design of the reference's ``ConditionalModel``
(`/root/reference/src/denoising_toy_utils.py:169-197`): two 128-wide linear
layers whose outputs are gated by a per-timestep learned multiplicative
embedding (initialised uniform in [0,1)), softplus activations, final linear
projection back to the data dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConditionalDense(nn.Module):
    """Linear layer with learned per-timestep multiplicative gate
    (`denoising_toy_utils.py:169-181`)."""

    features: int
    n_steps: int

    @nn.compact
    def __call__(self, x, t):
        out = nn.Dense(self.features)(x)
        gamma = nn.Embed(
            self.n_steps,
            self.features,
            embedding_init=nn.initializers.uniform(scale=1.0),
        )(t)
        return gamma * out


class ConditionalModel(nn.Module):
    """Toy denoiser MLP (`denoising_toy_utils.py:183-197`)."""

    dim: int = 2
    n_steps: int = 100
    hidden: int = 128

    @nn.compact
    def __call__(self, x, t):
        t = jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],))
        h = nn.softplus(ConditionalDense(self.hidden, self.n_steps)(x, t))
        h = nn.softplus(ConditionalDense(self.hidden, self.n_steps)(h, t))
        return nn.Dense(self.dim)(h)
