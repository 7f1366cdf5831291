"""Fused linear-attention Pallas kernel vs the XLA reference implementation
(interpret mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.ops import pallas_attention as pa

HEADS, DH = 8, 32
H = HEADS * DH


def _setup(b=2, n=256, c=32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(ks[0], (b, n, c))
    w_qkv = jax.random.normal(ks[1], (c, 3 * H)) / np.sqrt(c)
    w_out = jax.random.normal(ks[2], (H, c)) / np.sqrt(H)
    return x, w_qkv, w_out


def _pallas_interpret(x, w_qkv, w_out):
    xt = jnp.swapaxes(x, -1, -2)
    yt = pa._linear_attention_pallas(
        xt, jnp.swapaxes(w_qkv, 0, 1), jnp.swapaxes(w_out, 0, 1), HEADS, DH, True
    )
    return jnp.swapaxes(yt, -1, -2)


@pytest.mark.parametrize("n,c", [(256, 32), (128, 64), (384, 32)])
def test_forward_matches_reference(n, c):
    x, w_qkv, w_out = _setup(n=n, c=c)
    ref = pa.linear_attention_reference(x, w_qkv, w_out, HEADS, DH)
    got = _pallas_interpret(x, w_qkv, w_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_multi_tile_forward():
    # n > tile so the streamed (flash-style) k-softmax path is exercised
    x, w_qkv, w_out = _setup(n=1024, c=32)
    ref = pa.linear_attention_reference(x, w_qkv, w_out, HEADS, DH)
    got = _pallas_interpret(x, w_qkv, w_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_backward_matches_reference():
    x, w_qkv, w_out = _setup(n=256, c=32, b=3)

    def loss_ref(x, wq, wo):
        return jnp.sum(jnp.sin(pa.linear_attention_reference(x, wq, wo, HEADS, DH)))

    def loss_pal(x, wq, wo):
        return jnp.sum(jnp.sin(_pallas_interpret(x, wq, wo)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w_qkv, w_out)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(x, w_qkv, w_out)
    for name, a, b in zip(("dx", "dw_qkv", "dw_out"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_backward_multi_tile():
    x, w_qkv, w_out = _setup(n=1024, c=32, b=2, seed=3)

    def loss_ref(x, wq, wo):
        return jnp.sum(pa.linear_attention_reference(x, wq, wo, HEADS, DH) ** 2)

    def loss_pal(x, wq, wo):
        return jnp.sum(_pallas_interpret(x, wq, wo) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w_qkv, w_out)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(x, w_qkv, w_out)
    for name, a, b in zip(("dx", "dw_qkv", "dw_out"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4, err_msg=name
        )
