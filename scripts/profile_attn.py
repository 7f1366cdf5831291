"""Scan-chained A/B: Pallas vs XLA linear attention inside an XLA-GN resnet
context at Darcy level-0 shape, plus full level-0 stage patterns."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from physicsinformeddiffusionmodels_tpu.ops.pallas_kernels import _reference_impl
from physicsinformeddiffusionmodels_tpu.ops.pallas_attention import (
    linear_attention, linear_attention_reference,
)

B, P, C = 64, 64, 32
H = 8 * 32
x = jax.random.normal(jax.random.key(0), (B, P, P, C), jnp.bfloat16)
w = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.05
bias = jnp.zeros((C,), jnp.bfloat16)
gamma = jnp.ones((C,), jnp.bfloat16)
w_qkv = jax.random.normal(jax.random.key(2), (C, 3 * H), jnp.bfloat16) * 0.05
w_out = jax.random.normal(jax.random.key(3), (H, C), jnp.bfloat16) * 0.05
NSCAN = 20


def conv(h):
    return jax.lax.conv_general_dilated(
        h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias


def ln(h):
    t = h.reshape(B, -1, C)
    m = t.mean(axis=-1, keepdims=True)
    v = jnp.var(t, axis=-1, keepdims=True)
    return ((t - m) / jnp.sqrt(v + 1e-5) * gamma).astype(h.dtype)


def gn(h):
    return _reference_impl(h.reshape(B, -1, C), gamma, jnp.zeros_like(gamma),
                           None, None, 8, 1e-5).reshape(B, P, P, C)


def attn_pallas(h):
    t = ln(h)
    o = linear_attention(t, w_qkv, w_out, heads=8, dim_head=32)
    return (o.reshape(B, P, P, C) + h).astype(h.dtype)


def attn_xla(h):
    t = ln(h)
    o = linear_attention_reference(t, w_qkv, w_out, heads=8, dim_head=32)
    return (o.reshape(B, P, P, C) + h).astype(h.dtype)


def chain(step):
    def f(x):
        def body(c, _):
            return step(c).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=NSCAN)
        return out
    return jax.jit(f)


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
    print(f"{label:46s} {dt*1e6:8.1f} us/op")
    return dt


timeit("prenorm-attn pallas (standalone)", chain(attn_pallas), x)
timeit("prenorm-attn xla (standalone)", chain(attn_xla), x)


def stage(attn):
    def f(h):
        a = gn(conv(h))
        a = gn(conv(a)) + h
        b = gn(conv(a))
        b = gn(conv(b)) + a
        return attn(b)
    return f


timeit("level0 stage (2 resnet + pallas attn)", chain(stage(attn_pallas)), x)
timeit("level0 stage (2 resnet + xla attn)", chain(stage(attn_xla)), x)
