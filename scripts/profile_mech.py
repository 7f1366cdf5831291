"""Profile the mechanics train step on TPU with synthetic batch data."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.config import RunConfig
from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
from physicsinformeddiffusionmodels_tpu.models.unet import UNet
from physicsinformeddiffusionmodels_tpu.physics.mechanics import MechanicsResidual
from physicsinformeddiffusionmodels_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from train_mechanics import build_mechanics_loss_fn


def main():
    cfg = RunConfig(gov_eqs="mechanics")
    B = cfg.train_batch_size
    P = cfg.pixels_per_dim
    print(f"batch={B} pixels={P} dtype={cfg.compute_dtype}")

    sched = create_schedule(cfg.diff_steps)
    mech = MechanicsResidual(pixels_per_dim=P)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    model = UNet(
        dim=128, channels=10, out_dim=3, sigmoid_last_channel=True, dtype=dt
    )
    loss_fn = build_mechanics_loss_fn(model, sched, mech, cfg)

    batch = jax.random.normal(jax.random.key(0), (B, P + 1, P + 1, 10))
    params = model.init(
        jax.random.key(1), jnp.zeros((1, P, P, 10)), jnp.zeros((1,), jnp.int32)
    )
    n_par = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_par/1e6:.2f}M")
    tx = make_optimizer(cfg.lr)
    state = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx)

    key = jax.random.key(2)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    jax.block_until_ready(aux.loss)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    jax.block_until_ready(aux.loss)
    dtm = (time.perf_counter() - t0) / reps
    print(f"mech train step: {dtm*1e3:.2f} ms ({B/dtm:.1f} samples/s)  loss={float(aux.loss):.3e}")


if __name__ == "__main__":
    main()
