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


def test_whole_row_tile_cap():
    # PIDM_ATTN_TILE_CAP raised: the row runs as ONE tile (n_tiles=1), the
    # streamed-softmax carries collapse to a single pass. Same math.
    x, w_qkv, w_out = _setup(n=1024, c=32, b=2, seed=5)
    ref = pa.linear_attention_reference(x, w_qkv, w_out, HEADS, DH)
    try:
        pa.set_attention_tile_cap(4096)
        assert pa._choose_tile(1024, H, 32) == 1024
        got = _pallas_interpret(x, w_qkv, w_out)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

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
    finally:
        pa.set_attention_tile_cap(None)
    # default cap is 4096 (measured-best config); 512 restores the old tiling
    assert pa._choose_tile(1024, H, 32) == 1024
    pa.set_attention_tile_cap(512)
    try:
        assert pa._choose_tile(1024, H, 32) == 512
    finally:
        pa.set_attention_tile_cap(None)


def test_tile_vmem_guard():
    # the VMEM budget caps the tile even when the cap allows more
    pa.set_attention_tile_cap(4096)
    try:
        # darcy level-0 (H=128): whole 4096-token row fits the budget
        assert pa._choose_tile(4096, 128, 32) == 4096
        # a hypothetical very wide H must be tiled finer than the cap
        assert pa._choose_tile(4096, 2048, 256) < 4096
    finally:
        pa.set_attention_tile_cap(None)


# ---- fused pre-norm residual block kernel ----


def _block_setup(b=2, n=256, c=32, seed=1):
    ks = jax.random.split(jax.random.key(seed), 5)
    x = jax.random.normal(ks[0], (b, n, c))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    w_qkv = jax.random.normal(ks[2], (c, 3 * H)) / np.sqrt(c)
    w_out = jax.random.normal(ks[3], (H, c)) / np.sqrt(H)
    b_out = 0.1 * jax.random.normal(ks[4], (c,))
    return x, gamma, w_qkv, w_out, b_out


def _block_interpret(x, gamma, w_qkv, w_out, b_out):
    b, n, c = x.shape
    yt = pa._linear_attention_block_pallas(
        jnp.swapaxes(x, -1, -2), gamma.reshape(c, 1),
        jnp.swapaxes(w_qkv, 0, 1), w_out, b_out.reshape(c, 1),
        HEADS, DH, 1e-5, True
    )
    return jnp.swapaxes(yt, -1, -2)


@pytest.mark.parametrize("n,c", [(256, 32), (128, 64), (1024, 32)])
def test_block_forward_matches_reference(n, c):
    x, gamma, w_qkv, w_out, b_out = _block_setup(n=n, c=c)
    ref = pa.linear_attention_block_reference(
        x, gamma, w_qkv, w_out, b_out, HEADS, DH
    )
    got = _block_interpret(x, gamma, w_qkv, w_out, b_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_block_whole_row_tile_cap():
    # fused block kernels at tile == n (big-tile config), fwd + bwd
    x, gamma, w_qkv, w_out, b_out = _block_setup(n=1024, c=32, b=2, seed=9)
    ref = pa.linear_attention_block_reference(x, gamma, w_qkv, w_out, b_out, HEADS, DH)
    try:
        pa.set_attention_tile_cap(4096)
        got = _block_interpret(x, gamma, w_qkv, w_out, b_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)

        def loss_ref(*args):
            return jnp.sum(pa.linear_attention_block_reference(*args, HEADS, DH) ** 2)

        def loss_pal(*args):
            return jnp.sum(_block_interpret(*args) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, w_qkv, w_out, b_out)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(x, gamma, w_qkv, w_out, b_out)
        names = ("dx", "dgamma", "dw_qkv", "dw_out", "db_out")
        for name, a, b in zip(names, g_ref, g_pal):
            np.testing.assert_allclose(
                np.asarray(b).reshape(np.asarray(a).shape), np.asarray(a),
                atol=5e-4, rtol=5e-4, err_msg=name
            )
    finally:
        pa.set_attention_tile_cap(None)


@pytest.mark.parametrize("n,c", [(256, 32), (1024, 32)])
def test_block_backward_matches_reference(n, c):
    x, gamma, w_qkv, w_out, b_out = _block_setup(n=n, c=c, b=3, seed=7)

    def loss_ref(*args):
        return jnp.sum(jnp.sin(pa.linear_attention_block_reference(
            *args, HEADS, DH)))

    def loss_pal(*args):
        return jnp.sum(jnp.sin(_block_interpret(*args)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, gamma, w_qkv, w_out, b_out)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(
        x, gamma, w_qkv, w_out, b_out)
    names = ("dx", "dgamma", "dw_qkv", "dw_out", "db_out")
    for name, a, b in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b).reshape(np.asarray(a).shape), np.asarray(a),
            atol=5e-4, rtol=5e-4, err_msg=name
        )
