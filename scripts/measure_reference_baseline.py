"""Measure the torch reference's Darcy train step on this host's CPU.

Pins the performance baseline with MEASUREMENT instead of a constant
(VERDICT r1 item 3). Runs the reference implementation verbatim
(/root/reference via tests/reference_shims): Unet3D(dim=32, channels=2) +
ResidualsDarcy + DenoisingDiffusion.model_estimation_loss + backward +
clip + Adam (`/root/reference/main.py:122-168`), batch 64 at 64x64, fp32,
and — for a same-silicon ratio — this framework's identical train step on
the same CPU (JAX_PLATFORMS=cpu).

Writes BASELINE_MEASURED.json at the repo root:
  {
    "torch_cpu_samples_per_sec": ...,   # reference train step, this host
    "jax_cpu_samples_per_sec": ...,     # this framework, same host, fp32
    "cpu_ratio": ...,                   # jax/torch on identical silicon
    "host": ..., "threads": ..., "batch": 64, "steps_timed": N
  }

bench.py combines this with an analytic-FLOPs A100 ceiling to derive
vs_baseline (see bench.py for the derivation).

Usage:  python scripts/measure_reference_baseline.py [--steps 3] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time
from pathlib import Path

# hard override: the container exports JAX_PLATFORMS=axon (the TPU
# backend); this baseline must compare on the host CPU on both sides
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def measure_torch(batch: int, steps: int, pixels: int = 64) -> float:
    import refbridge

    refbridge.install()
    import torch

    torch.manual_seed(0)
    du = refbridge.import_reference("src.denoising_utils")
    rd = refbridge.import_reference("src.residuals_darcy")
    um = refbridge.import_reference("src.unet_model")

    device = "cpu"
    diffusion = du.DenoisingDiffusion(100, device)
    model = um.Unet3D(dim=32, channels=2, sigmoid_last_channel=False).to(device)
    residuals = rd.ResidualsDarcy(
        model=model, fd_acc=2, pixels_per_dim=pixels, pixels_at_boundary=True,
        reverse_d1=True, device=device, bcs="none", domain_length=1.0,
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    data = torch.randn(batch, 2, pixels, pixels)

    def step():
        loss, *_ = diffusion.model_estimation_loss(
            data, residual_func=residuals, c_data=1.0, c_residual=1e-3
        )
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def measure_jax(batch: int, steps: int, pixels: int = 64) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from physicsinformeddiffusionmodels_tpu.config import RunConfig
    from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
    from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
    from physicsinformeddiffusionmodels_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )
    import train as train_mod

    cfg = RunConfig(gov_eqs="darcy", train_batch_size=batch, compute_dtype="float32")
    sched = create_schedule(cfg.diff_steps)
    physics = DarcyResidual(pixels_per_dim=pixels)
    model = train_mod.build_model(cfg)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, pixels, pixels, 2)),
        jnp.zeros((1,), jnp.int32),
    )
    tx = make_optimizer(cfg.lr, cfg.grad_clip)
    state = create_train_state(params, tx)
    loss_fn = train_mod.build_darcy_loss_fn(model, sched, physics, cfg)
    train_step = make_train_step(loss_fn, tx, donate=False)
    data = jax.random.normal(jax.random.key(1), (batch, pixels, pixels, 2))
    key = jax.random.key(2)

    state, _ = jax.block_until_ready(train_step(state, data, key))  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = train_step(state, data, key)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default=str(REPO / "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    print("measuring torch reference train step (CPU)...")
    torch_sps = measure_torch(args.batch, args.steps)
    print(f"  torch reference: {torch_sps:.2f} samples/s")
    print("measuring this framework's train step (CPU, fp32)...")
    jax_sps = measure_jax(args.batch, args.steps)
    print(f"  this framework:  {jax_sps:.2f} samples/s")

    out = {
        "torch_cpu_samples_per_sec": round(torch_sps, 3),
        "jax_cpu_samples_per_sec": round(jax_sps, 3),
        "cpu_ratio": round(jax_sps / torch_sps, 3),
        "host": platform.processor() or platform.machine(),
        "threads": os.cpu_count(),
        "batch": args.batch,
        "steps_timed": args.steps,
        "pixels": 64,
        "note": (
            "reference executed verbatim from /root/reference via "
            "tests/reference_shims; same host, same batch, fp32 both sides"
        ),
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
