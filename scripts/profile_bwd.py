"""Bisect the slow backward: time jax.grad through progressively larger
pieces of the model/loss."""

import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from physicsinformeddiffusionmodels_tpu.models.unet import (
    Attention,
    Block,
    Downsample,
    PreNormResidual,
    ResnetBlock,
    SpatialLinearAttention,
    UNet,
    Upsample,
)


def timeit(fn, *a, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_model(name, model, x, extra=None):
    if extra is None:
        params = model.init(jax.random.key(0), x)
        fwd = jax.jit(lambda p, xx: jnp.sum(model.apply(p, xx) ** 2))
    else:
        params = model.init(jax.random.key(0), x, extra)
        fwd = jax.jit(lambda p, xx: jnp.sum(model.apply(p, xx, extra) ** 2))
    g = jax.jit(jax.grad(fwd))
    tf = timeit(fwd, params, x)
    tg = timeit(g, params, x)
    print(f"{name:34s} fwd {tf*1e3:8.2f} ms   grad {tg*1e3:8.2f} ms   ratio {tg/tf:6.1f}x")


B, P = 64, 64
x = jax.random.normal(jax.random.key(1), (B, P, P, 32), jnp.bfloat16)

bench_model("conv3x3 stack x4", nn.Sequential([nn.Conv(32, (3, 3), dtype=jnp.bfloat16) for _ in range(4)]), x)
bench_model("Block (conv+fused GN/SiLU)", Block(32, dtype=jnp.bfloat16), x)
bench_model("ResnetBlock", ResnetBlock(32, dtype=jnp.bfloat16), x)
bench_model("SpatialLinearAttention", SpatialLinearAttention(32, dtype=jnp.bfloat16), x)
bench_model("Downsample", Downsample(32, dtype=jnp.bfloat16), x)
bench_model("Upsample", Upsample(32, dtype=jnp.bfloat16), x)

# full unet fwd+grad
model = UNet(dim=32, channels=2, dtype=jnp.bfloat16)
x2 = jax.random.normal(jax.random.key(1), (B, P, P, 2))
t = jnp.zeros((B,), jnp.int32)
params = model.init(jax.random.key(0), x2, t)
loss = jax.jit(lambda p, xx: jnp.sum(model.apply(p, xx, t).astype(jnp.float32) ** 2))
g = jax.jit(jax.grad(loss))
print(f"{'UNet full':34s} fwd {timeit(loss, params, x2)*1e3:8.2f} ms   grad {timeit(g, params, x2)*1e3:8.2f} ms")
