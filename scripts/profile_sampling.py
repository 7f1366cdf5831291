"""Profile the Darcy ancestral sampling loop (T=100 scan) on the current device."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.config import RunConfig
from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
from train import build_model, make_sample_fn


def main():
    cfg = RunConfig(gov_eqs="darcy")
    model = build_model(cfg)
    sched = create_schedule(cfg.diff_steps)
    physics = DarcyResidual(pixels_per_dim=64)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 2)), jnp.zeros((1,), jnp.int32)
    )
    fn = make_sample_fn(model, sched, physics, cfg)
    for B in (8, 64):
        t0 = time.perf_counter()
        out = fn(params, jax.random.key(1), B)
        jax.block_until_ready(out)
        tc = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            out = fn(params, jax.random.key(r), B)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"B={B}: sample loop {dt*1e3:.1f} ms  ({B/dt:.2f} samples/s, "
            f"{B*cfg.diff_steps/dt:.0f} denoise-steps/s)  compile+1st {tc:.1f}s"
        )


if __name__ == "__main__":
    main()
