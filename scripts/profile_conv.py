"""Why do GN-kernel-fed 3x3 convs at [64,64,64,32] compile to the slow
batch-in-lanes emitter? Benchmark conv in different producer contexts."""
import sys, time, functools
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from flax import linen as nn
from physicsinformeddiffusionmodels_tpu.ops.pallas_kernels import (
    group_norm_film_silu, _reference_impl,
)

B, P, C = 64, 64, 32
x = jax.random.normal(jax.random.key(0), (B, P, P, C), jnp.bfloat16)
w = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.05
bias = jnp.zeros((C,), jnp.bfloat16)
gamma = jnp.ones((C,), jnp.bfloat16)
beta = jnp.zeros((C,), jnp.bfloat16)


def conv(h, w, bias):
    return jax.lax.conv_general_dilated(
        h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias


def timeit(label, f, *a):
    for _ in range(3):
        out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1e6:8.1f} us")
    return dt


# 1. conv alone
timeit("conv alone", jax.jit(lambda x: conv(x, w, bias)), x)

# 2. pallas GN -> conv (the pattern in the model)
def gn_conv(x):
    h = group_norm_film_silu(x, gamma, beta, None, None, groups=8)
    return conv(h, w, bias)
timeit("pallas GN -> conv", jax.jit(gn_conv), x)

# 3. XLA GN -> conv
def gn_conv_xla(x):
    h = _reference_impl(x.reshape(B, -1, C), gamma, beta, None, None, 8, 1e-5)
    return conv(h.reshape(B, P, P, C), w, bias)
timeit("XLA GN -> conv", jax.jit(gn_conv_xla), x)

# 4. pallas GN -> optimization_barrier -> conv
def gn_conv_bar(x):
    h = group_norm_film_silu(x, gamma, beta, None, None, groups=8)
    h = jax.lax.optimization_barrier(h)
    return conv(h, w, bias)
timeit("pallas GN -> barrier -> conv", jax.jit(gn_conv_bar), x)

# 5. two convs chained (conv -> conv): does the 2nd get the bad emitter?
def conv2(x):
    h = conv(x, w, bias)
    return conv(h, w, bias)
timeit("conv -> conv", jax.jit(conv2), x)

# 6. pallas GN -> conv -> pallas GN -> conv (full block pattern)
def blk(x):
    h = conv(x, w, bias)
    h = group_norm_film_silu(h, gamma, beta, None, None, groups=8)
    h = conv(h, w, bias)
    h = group_norm_film_silu(h, gamma, beta, None, None, groups=8)
    return h
timeit("(conv -> GN)x2 resnet-ish", jax.jit(blk), x)

# 7. s2d potential: conv2x2 stride1 on [64,32,32,128]
x2 = jax.random.normal(jax.random.key(2), (B, P // 2, P // 2, 4 * C), jnp.bfloat16)
w2 = jax.random.normal(jax.random.key(3), (2, 2, 4 * C, 4 * C), jnp.bfloat16) * 0.05
b2 = jnp.zeros((4 * C,), jnp.bfloat16)
timeit("s2d-equivalent conv 2x2 @128ch", jax.jit(lambda x: conv(x, w2, b2)), x2)

# 8. 9-shift matmul formulation of conv3x3 fed by pallas GN
def conv_shift(h, w, bias):
    out = jnp.zeros((B, P, P, C), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            hs = jnp.roll(h, (-dy, -dx), axis=(1, 2))
            out = out + jnp.dot(hs, w[dy + 1, dx + 1],
                                preferred_element_type=jnp.float32)
    return out.astype(h.dtype) + bias  # note: wrap-around edges, just for timing
def gn_conv_shift(x):
    h = group_norm_film_silu(x, gamma, beta, None, None, groups=8)
    return conv_shift(h, w, bias)
timeit("pallas GN -> 9-shift-matmul conv", jax.jit(gn_conv_shift), x)
