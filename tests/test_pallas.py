"""Fused GroupNorm+FiLM+SiLU Pallas kernel vs plain-XLA reference
(interpret mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.ops import pallas_kernels as pk


def _setup(b=3, h=8, w=8, c=32, film=True, seed=0):
    k = jax.random.split(jax.random.key(seed), 5)
    x = jax.random.normal(k[0], (b, h, w, c))
    gamma = jax.random.normal(k[1], (c,)) * 0.1 + 1.0
    beta = jax.random.normal(k[2], (c,)) * 0.1
    scale = jax.random.normal(k[3], (b, c)) * 0.1 if film else None
    shift = jax.random.normal(k[4], (b, c)) * 0.1 if film else None
    return x, gamma, beta, scale, shift


@pytest.mark.parametrize("film", [True, False])
def test_forward_matches_reference(film):
    x, gamma, beta, scale, shift = _setup(film=film)
    ref = pk.group_norm_film_silu(x, gamma, beta, scale, shift, force_pallas=False)
    # interpret-mode pallas path
    b, c = x.shape[0], x.shape[-1]
    sc = jnp.zeros((b, c)) if scale is None else scale
    sh = jnp.zeros((b, c)) if shift is None else shift
    got = pk._gn_film_silu_pallas(
        x.reshape(b, -1, c), gamma, beta, sc, sh, 8, 1e-5, True
    ).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_backward_matches_reference():
    x, gamma, beta, scale, shift = _setup()
    b, c = x.shape[0], x.shape[-1]

    def loss_ref(x, gamma, beta, scale, shift):
        y = pk.group_norm_film_silu(x, gamma, beta, scale, shift, force_pallas=False)
        return jnp.sum(jnp.sin(y))

    def loss_pallas(x, gamma, beta, scale, shift):
        y = pk._gn_film_silu_pallas(
            x.reshape(b, -1, c), gamma, beta, scale, shift, 8, 1e-5, True
        ).reshape(x.shape)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, scale, shift)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, scale, shift)
    for a, b_ in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=2e-4)


def test_groupnorm_matches_flax():
    from flax import linen as nn

    x, gamma, beta, _, _ = _setup(film=False)
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    params = {"params": {"scale": gamma, "bias": beta}}
    expect = nn.silu(gn.apply(params, x))
    got = pk.group_norm_film_silu(x, gamma, beta, force_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)
