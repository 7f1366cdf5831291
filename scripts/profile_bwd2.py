"""Isolate the slow piece of the train step: fwd (arg vs const, pipelined vs
latency), fwd+bwd, +adam, and the sequential scan step."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp, optax
from physicsinformeddiffusionmodels_tpu.models.unet import UNet
from physicsinformeddiffusionmodels_tpu.training import make_optimizer

B, P = 64, 64
model = UNet(dim=32, channels=2, dtype=jnp.bfloat16)
params = model.init(jax.random.key(0), jnp.zeros((1,P,P,2)), jnp.zeros((1,),jnp.int32))
x = jax.random.normal(jax.random.key(1), (B,P,P,2))
t = jnp.zeros((B,), jnp.int32)

def tput(fn, *a, reps=20):
    for _ in range(3): out = fn(*a)
    jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(reps): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/reps

def lat(fn, *a, reps=20):
    for _ in range(3): jax.block_until_ready(fn(*a))
    t0=time.perf_counter()
    for _ in range(reps): jax.block_until_ready(fn(*a))
    return (time.perf_counter()-t0)/reps

fwd_arg = jax.jit(lambda p, xx: model.apply(p, xx, t))
fwd_const = jax.jit(lambda p: model.apply(p, x, t))
print(f"fwd (arg, pipelined):   {tput(fwd_arg, params, x)*1e3:8.2f} ms")
print(f"fwd (arg, latency):     {lat(fwd_arg, params, x)*1e3:8.2f} ms")
print(f"fwd (const, pipelined): {tput(fwd_const, params)*1e3:8.2f} ms")

# chained fwd: output feeds next input -> true sequential device time
def fwd_chain(p, xx, n=20):
    def body(c, _):
        return model.apply(p, c, t).astype(c.dtype), ()
    out, _ = jax.lax.scan(body, xx, None, length=n)
    return out
fwd_chain_j = jax.jit(fwd_chain, static_argnums=(2,))
print(f"fwd (scan x20):         {tput(fwd_chain_j, params, x)/20*1e3:8.2f} ms")

def loss(p, xx):
    out = model.apply(p, xx, t).astype(jnp.float32)
    return ((out - xx)**2).mean()
g = jax.jit(jax.grad(loss))
print(f"fwd+bwd (pipelined):    {tput(g, params, x)*1e3:8.2f} ms")

tx = make_optimizer(1e-4)
opt_state = tx.init(params)
def full(p, os, xx):
    grads = jax.grad(loss)(p, xx)
    upd, os2 = tx.update(grads, os, p)
    return optax.apply_updates(p, upd), os2
def chain(p, os, xx, n=10):
    def body(carry, _):
        p, os = carry
        return full(p, os, xx), ()
    (p, os), _ = jax.lax.scan(body, (p, os), None, length=n)
    return p, os
chainj = jax.jit(chain, static_argnums=(3,))
print(f"train scan x10 /step:   {tput(chainj, params, opt_state, x)/10*1e3:8.2f} ms")
