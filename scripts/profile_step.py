"""Break down the Darcy train-step time: dispatch overhead vs compute,
UNet-only vs physics residual, per-call vs scan-fused."""

import argparse
import time

import jax
import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.diffusion import (
    LossWeights,
    create_schedule,
    pidm_loss,
    uniform_timesteps,
)
from physicsinformeddiffusionmodels_tpu.models.unet import UNet
from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
from physicsinformeddiffusionmodels_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def timeit(fn, *a, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def timeit_step(step, state, x, reps=20, warmup=3):
    """Time a donating train step by threading state through the calls."""
    key = jax.random.key(7)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        state, aux = step(state, x, k)
    jax.block_until_ready(aux.loss)
    t0 = time.perf_counter()
    for _ in range(reps):
        key, k = jax.random.split(key)
        state, aux = step(state, x, k)
    jax.block_until_ready(aux.loss)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pixels", type=int, default=64)
    args = ap.parse_args()
    B, P = args.batch, args.pixels

    sched = create_schedule(100)
    physics = DarcyResidual(pixels_per_dim=P)
    model = UNet(dim=32, channels=2, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, P, P, 2)), jnp.zeros((1,), jnp.int32))
    tx = make_optimizer(1e-4)
    state = create_train_state(params, tx)
    x = jax.random.normal(jax.random.key(1), (B, P, P, 2))

    def mk_loss(c_residual):
        def loss_fn(p, batch_x, key, step):
            t_key, n_key = jax.random.split(key)
            t = uniform_timesteps(t_key, batch_x.shape[0], 100)
            return pidm_loss(
                sched, batch_x, t, n_key,
                denoise_fn=lambda xx, tt: model.apply(p, xx, tt).astype(jnp.float32),
                physics_fn=physics if c_residual else None,
                weights=LossWeights(c_data=1.0, c_residual=c_residual),
            )
        return loss_fn

    # 1. pure UNet fwd
    fwd = jax.jit(lambda p, xx: model.apply(p, xx, jnp.zeros((B,), jnp.int32)))
    t_fwd = timeit(fwd, params, x)
    print(f"unet fwd only:            {t_fwd*1e3:8.2f} ms  ({B/t_fwd:9.1f} samples/s)")

    # 2. full train step, no physics
    step_nophys = make_train_step(mk_loss(0.0), tx, donate=False)
    t_np = timeit_step(step_nophys, state, x)
    print(f"train step (data only):   {t_np*1e3:8.2f} ms  ({B/t_np:9.1f} samples/s)")

    # 3. full train step with residual
    step_full = make_train_step(mk_loss(1e-3), tx, donate=False)
    t_full = timeit_step(step_full, state, x)
    print(f"train step (full):        {t_full*1e3:8.2f} ms  ({B/t_full:9.1f} samples/s)")

    # 4. scan-fused 10 steps in one executable (removes dispatch overhead)
    def scan10(s, key):
        def body(carry, k):
            s = carry
            s, aux = step_full(s, x, k)
            return s, aux.loss
        keys = jax.random.split(key, 10)
        s, losses = jax.lax.scan(body, s, keys)
        return losses[-1]

    scan10_j = jax.jit(scan10)
    t_scan = timeit(scan10_j, state, jax.random.key(3)) / 10
    print(f"train step (scan x10):    {t_scan*1e3:8.2f} ms  ({B/t_scan:9.1f} samples/s)")


if __name__ == "__main__":
    main()
