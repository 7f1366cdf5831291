"""A/B: old (LN + pallas LA + residual) vs fused block kernel, fwd and grad,
in conv context at Darcy level-0 shape."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from physicsinformeddiffusionmodels_tpu.ops.pallas_attention import (
    linear_attention, linear_attention_block,
)

B, P, C = 64, 64, 32
H = 8 * 32
x = jax.random.normal(jax.random.key(0), (B, P, P, C), jnp.bfloat16)
wc = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.05
gamma = jnp.ones((C,), jnp.float32)
w_qkv = jax.random.normal(jax.random.key(2), (C, 3 * H), jnp.float32) * 0.05
w_out = jax.random.normal(jax.random.key(3), (H, C), jnp.float32) * 0.05
b_out = jnp.zeros((C,), jnp.float32)
NSCAN = 20


def conv(h):
    return jax.lax.conv_general_dilated(
        h, wc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def ln(h):
    t = h.reshape(B, -1, C)
    m = t.mean(axis=-1, keepdims=True)
    v = jnp.var(t, axis=-1, keepdims=True)
    return ((t - m) / jnp.sqrt(v + 1e-5) * gamma).astype(h.dtype)


def attn_old(h):
    t = ln(h)
    o = linear_attention(t.astype(jnp.bfloat16), w_qkv.astype(jnp.bfloat16),
                         w_out.astype(jnp.bfloat16), heads=8, dim_head=32)
    return ((o + b_out).reshape(B, P, P, C) + h).astype(h.dtype)


def attn_fused(h):
    t = h.reshape(B, -1, C).astype(jnp.bfloat16)
    o = linear_attention_block(t, gamma, w_qkv, w_out, b_out, heads=8, dim_head=32)
    return o.reshape(B, P, P, C).astype(h.dtype)


def chain(step):
    def f(x):
        def body(c, _):
            return (conv(step(c)) + c).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=NSCAN)
        return out
    return jax.jit(f)


def chain_grad(step):
    def one(c):
        return (conv(step(c)) + c).astype(c.dtype)

    def loss(x):
        def body(c, _):
            return one(c), ()
        out, _ = jax.lax.scan(body, x, None, length=NSCAN)
        return jnp.sum(out.astype(jnp.float32) ** 2)
    return jax.jit(jax.grad(loss))


def timeit(label, f, *a):
    for _ in range(2):
        out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / NSCAN
    print(f"{label:40s} {dt*1e6:8.1f} us/op")
    return dt


timeit("fwd old (ln+pallas+res, conv ctx)", chain(attn_old), x)
timeit("fwd fused block (conv ctx)", chain(attn_fused), x)
timeit("fwd+bwd old", chain_grad(attn_old), x)
timeit("fwd+bwd fused", chain_grad(attn_fused), x)
