"""Scan-chained device timings: conv / GN variants at Darcy level-0 shape."""
import sys, time, functools
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from physicsinformeddiffusionmodels_tpu.ops.pallas_kernels import (
    group_norm_film_silu, _reference_impl,
)

B, P, C = 64, 64, 32
x = jax.random.normal(jax.random.key(0), (B, P, P, C), jnp.bfloat16)
w = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.05
bias = jnp.zeros((C,), jnp.bfloat16)
gamma = jnp.ones((C,), jnp.bfloat16)
beta = jnp.zeros((C,), jnp.bfloat16)
scale = jax.random.normal(jax.random.key(4), (B, C), jnp.bfloat16) * 0.1
shift = jax.random.normal(jax.random.key(5), (B, C), jnp.bfloat16) * 0.1
NSCAN = 20


def conv(h):
    return jax.lax.conv_general_dilated(
        h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias


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
    print(f"{label:44s} {dt*1e6:8.1f} us/op")
    return dt


timeit("conv", chain(conv), x)
timeit("conv->pallasGN(FiLM)", chain(
    lambda h: group_norm_film_silu(conv(h), gamma, beta, scale, shift, groups=8)), x)
timeit("conv->xlaGN(FiLM)", chain(
    lambda h: _reference_impl(conv(h).reshape(B, -1, C), gamma, beta, scale, shift,
                              8, 1e-5).reshape(B, P, P, C)), x)


def resnet_pallas(h):
    a = group_norm_film_silu(conv(h), gamma, beta, scale, shift, groups=8)
    b = group_norm_film_silu(conv(a), gamma, beta, None, None, groups=8)
    return b + h


def resnet_xla(h):
    a = _reference_impl(conv(h).reshape(B, -1, C), gamma, beta, scale, shift, 8, 1e-5)
    b = _reference_impl(conv(a.reshape(B, P, P, C)).reshape(B, -1, C), gamma, beta,
                        None, None, 8, 1e-5)
    return b.reshape(B, P, P, C) + h


timeit("resnetblock pallasGN", chain(resnet_pallas), x)
timeit("resnetblock xlaGN", chain(resnet_xla), x)

# s2d conv
x2 = jax.random.normal(jax.random.key(2), (B, P // 2, P // 2, 4 * C), jnp.bfloat16)
w2 = jax.random.normal(jax.random.key(3), (2, 2, 4 * C, 4 * C), jnp.bfloat16) * 0.05
b2 = jnp.zeros((4 * C,), jnp.bfloat16)


def conv_s2d(h):
    return jax.lax.conv_general_dilated(
        h, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b2


timeit("s2d conv 2x2 @128ch [64,32,32,128]", chain(conv_s2d), x2)

# wide conv for reference: 3x3 at [64,16,16,128] (level-2 shape)
x3 = jax.random.normal(jax.random.key(6), (B, 16, 16, 128), jnp.bfloat16)
w3 = jax.random.normal(jax.random.key(7), (3, 3, 128, 128), jnp.bfloat16) * 0.05


def conv_l2(h):
    return jax.lax.conv_general_dilated(
        h, w3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


timeit("conv 3x3 @128ch [64,16,16,128]", chain(conv_l2), x3)
