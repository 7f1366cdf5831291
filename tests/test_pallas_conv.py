"""Fused channel-major conv3x3+GN+FiLM+SiLU Pallas kernel vs the XLA oracle
(interpret mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.ops import pallas_conv as pc


def _setup(b=2, p=16, ci=32, co=32, film=True, seed=0):
    ks = jax.random.split(jax.random.key(seed), 7)
    n = p * p
    x = jax.random.normal(ks[0], (b, ci, n))
    w = jax.random.normal(ks[1], (3, 3, ci, co)) / np.sqrt(9 * ci)
    bias = 0.1 * jax.random.normal(ks[2], (co,))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[3], (co,))
    beta = 0.1 * jax.random.normal(ks[4], (co,))
    scale = 0.1 * jax.random.normal(ks[5], (b, co)) if film else None
    shift = 0.1 * jax.random.normal(ks[6], (b, co)) if film else None
    return x, w, bias, gamma, beta, scale, shift


@pytest.mark.parametrize("p,ci,co,film", [
    (16, 32, 32, True),
    (16, 32, 32, False),
    (16, 64, 32, True),   # up-path concat: Ci != Co
    (8, 32, 64, True),    # N = tile = 64 single-tile path
    (32, 32, 32, True),   # multi-row tiles (T = 512 = 16 rows)
])
def test_forward_matches_reference(p, ci, co, film):
    x, w, bias, gamma, beta, scale, shift = _setup(p=p, ci=ci, co=co, film=film)
    ref = pc.conv_gn_film_silu_reference(
        x, w, bias, gamma, beta, scale, shift, p, groups=8)
    got = pc.conv_gn_film_silu_cm(
        x, w, bias, gamma, beta, scale, shift, p, groups=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("p,ci,co,film", [
    (16, 32, 32, True),
    (16, 64, 32, True),
    (8, 32, 64, False),
])
def test_backward_matches_reference(p, ci, co, film):
    x, w, bias, gamma, beta, scale, shift = _setup(p=p, ci=ci, co=co,
                                                   film=film, seed=5)
    args = (x, w, bias, gamma, beta) + ((scale, shift) if film else ())

    def loss_ref(*a):
        sc, sh = (a[5], a[6]) if film else (None, None)
        y = pc.conv_gn_film_silu_reference(a[0], a[1], a[2], a[3], a[4],
                                           sc, sh, p, 8)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_pal(*a):
        sc, sh = (a[5], a[6]) if film else (None, None)
        y = pc.conv_gn_film_silu_cm(a[0], a[1], a[2], a[3], a[4], sc, sh, p,
                                    groups=8, interpret=True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    argnums = tuple(range(len(args)))
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    g_pal = jax.grad(loss_pal, argnums=argnums)(*args)
    names = ("dx", "dw", "dbias", "dgamma", "dbeta", "dscale", "dshift")
    for name, a, b_ in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b_).reshape(np.asarray(a).shape), np.asarray(a),
            atol=5e-4, rtol=5e-4, err_msg=name)
