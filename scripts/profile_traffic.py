"""Static XLA cost analysis (FLOPs + HBM bytes) per UNet component at the
Darcy study shapes — identifies the bandwidth hogs without timing noise."""

import jax
import jax.numpy as jnp
from flax import linen as nn

from physicsinformeddiffusionmodels_tpu.models.unet import (
    Block,
    FrameAttention,
    PreNormResidual,
    ResnetBlock,
    SpatialLinearAttention,
    UNet,
)

B = 64
DT = jnp.bfloat16


def cost(name, model, *args):
    params = model.init(jax.random.key(0), *args)
    f = jax.jit(lambda p, *a: model.apply(p, *a))
    ca = f.lower(params, *args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    gb = ca.get("bytes accessed", 0) / 1e9
    gf = ca.get("flops", 0) / 1e9
    print(f"{name:42s} {gf:9.1f} GFLOP  {gb:8.2f} GB  -> {gb/0.819:6.1f} ms @819GB/s")


x64 = jax.random.normal(jax.random.key(1), (B, 64, 64, 32), DT)
x32 = jax.random.normal(jax.random.key(1), (B, 32, 32, 64), DT)

cost("LinearAttn 64x64 c32", PreNormResidual(32, SpatialLinearAttention(32, dtype=DT)), x64)
cost("LinearAttn 32x32 c64", PreNormResidual(64, SpatialLinearAttention(64, dtype=DT)), x32)
cost("ResnetBlock 64x64 c32", ResnetBlock(32, dtype=DT), x64)
cost("FrameAttention 64x64 c32 (F=1)", PreNormResidual(32, FrameAttention(32, dtype=DT)), x64[:, None])

model = UNet(dim=32, channels=2, dtype=DT)
x = jax.random.normal(jax.random.key(1), (B, 64, 64, 2))
t = jnp.zeros((B,), jnp.int32)
params = model.init(jax.random.key(0), x[:1], t[:1])
f = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt))
ca = f.lower(params, x, t).compile().cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print(f"{'UNet full fwd':42s} {ca['flops']/1e9:9.1f} GFLOP  {ca['bytes accessed']/1e9:8.2f} GB")

g = jax.jit(jax.grad(lambda p, xx, tt: jnp.sum(model.apply(p, xx, tt).astype(jnp.float32) ** 2)))
ca = g.lower(params, x, t).compile().cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print(f"{'UNet full grad':42s} {ca['flops']/1e9:9.1f} GFLOP  {ca['bytes accessed']/1e9:8.2f} GB")
