"""Benchmark: physics-informed diffusion train throughput on Darcy 64x64.

Measures the full training step of the flagship study — UNet(dim=32)
forward, FD Darcy residual, data + residual log-likelihood loss, backward
through everything, Adam + grad clip, EMA — at the reference's batch size 64
(`/root/reference/main.py:79-83`), plus the residual-evaluation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference repo publishes no numbers (BASELINE.md); the
comparison constant below is an engineering estimate of the A100 PyTorch
reference's train throughput for the same step (9.2M-param UNet3D + stencil
residual at batch 64), pending a measured run. vs_baseline > 5 is the
north-star target.
"""

from __future__ import annotations

import argparse
import json
import time

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

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

# Estimated A100 PyTorch reference train throughput (samples/s) for the
# Darcy study step; the reference publishes no benchmark numbers.
REF_A100_TRAIN_SAMPLES_PER_SEC = 300.0


def build(batch: int, pixels: int, compute_dtype, c_residual: float = 1e-3):
    sched = create_schedule(100)
    physics = DarcyResidual(pixels_per_dim=pixels)
    model = UNet(dim=32, channels=2, dtype=compute_dtype)

    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, pixels, pixels, 2)),
        jnp.zeros((1,), jnp.int32),
    )
    tx = make_optimizer(1e-4)
    state = create_train_state(params, tx)

    def loss_fn(p, batch_x, key, step):
        t_key, n_key = jax.random.split(key)
        t = uniform_timesteps(t_key, batch_x.shape[0], 100)
        return pidm_loss(
            sched, batch_x, t, n_key,
            denoise_fn=lambda x, tt: model.apply(p, x, tt).astype(jnp.float32),
            physics_fn=physics,
            weights=LossWeights(c_data=1.0, c_residual=c_residual),
        )

    train_step = make_train_step(loss_fn, tx)
    residual_eval = jax.jit(lambda x: physics.residual(x))
    return state, train_step, residual_eval


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pixels", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    dev = jax.devices()[0]
    n_chips = jax.device_count()
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    state, train_step, residual_eval = build(args.batch, args.pixels, compute_dtype)

    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (args.batch, args.pixels, args.pixels, 2))

    # warmup (compile). One base key: the per-step key derives inside the
    # jitted step from state.step (no per-step split dispatch).
    for i in range(args.warmup):
        state, aux = train_step(state, x, key)
    jax.block_until_ready(aux.loss)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, aux = train_step(state, x, key)
    jax.block_until_ready(aux.loss)
    dt = time.perf_counter() - t0
    train_sps = args.batch * args.steps / dt / n_chips

    # residual-evaluation throughput (the physics layer alone)
    r = residual_eval(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    reps = max(args.steps, 50)
    for _ in range(reps):
        r = residual_eval(x)
    jax.block_until_ready(r)
    res_eps = args.batch * reps / (time.perf_counter() - t0) / n_chips

    result = {
        "metric": "darcy64_train_samples_per_sec_per_chip",
        "value": round(train_sps, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(train_sps / REF_A100_TRAIN_SAMPLES_PER_SEC, 3),
        "residual_evals_per_sec_per_chip": round(res_eps, 1),
        "batch": args.batch,
        "pixels": args.pixels,
        "compute_dtype": args.dtype,
        "device": str(dev),
        "n_chips": n_chips,
        "final_loss": float(jax.device_get(aux.loss)),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
