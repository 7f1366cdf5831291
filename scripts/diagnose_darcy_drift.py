"""Root-cause analysis for the Darcy late-training residual drift.

`results/darcy_300k` showed the sampled-field PDE residual degrading
monotonically after ~40k iterations (2.8e-2 -> 7.2e-2 at 300k) while the
validation data loss stays flat. This tool walks the saved checkpoint
ladder and separates the candidate causes:

  * parameter-norm growth (the constant-lr Adam tail: weights keep random-
    walking once the data loss is saturated, and the x0 prediction drifts
    off the data manifold in ways an L2 data loss barely sees but a PDE
    residual punishes),
  * EMA lag (ema_decay 0.99 averages only ~100 steps - if raw params
    random-walk, the EMA tracks the walk rather than smoothing it),
  * denoiser quality per noise level (residual of the x0 prediction from
    fixed noisy states at a fixed t-grid - drift at low t means the final
    sampling steps inject the error).

Usage:
    JAX_PLATFORMS=cpu python scripts/diagnose_darcy_drift.py \
        --model-dir trained_models/darcy_300k --out results/darcy_300k/drift_diagnosis.json

Writes one JSON with, per checkpoint step: global param/EMA L2 norms, the
raw-vs-EMA distance, and mean |residual(x0_pred)| at t in {5,25,50,75,95}
on a fixed validation batch.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def tree_l2(tree) -> float:
    leaves = jax.tree_util.tree_leaves(tree)
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)))


def tree_dist(a, b) -> float:
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return float(
        jnp.sqrt(
            sum(
                jnp.sum(jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32)))
                for x, y in zip(la, lb)
            )
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="trained_models/darcy_300k")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t-grid", type=int, nargs="*", default=[5, 25, 50, 75, 95])
    ap.add_argument(
        "--data-split",
        choices=["valid", "train"],
        default="valid",
        help="which dataset the fixed eval batch is drawn from; a residual "
        "that stays flat on train while growing on valid pins overfitting",
    )
    args = ap.parse_args()

    import train as train_mod
    from flax import serialization
    from physicsinformeddiffusionmodels_tpu.config import RunConfig
    from physicsinformeddiffusionmodels_tpu.data import load_darcy_dataset
    from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
    from physicsinformeddiffusionmodels_tpu.diffusion.schedule import q_sample
    from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
    from physicsinformeddiffusionmodels_tpu.training import load_checkpoint

    mdir = Path(args.model_dir)
    cfg = RunConfig.load(mdir / "config.json")
    model = train_mod.build_model(cfg)
    sched = create_schedule(cfg.diff_steps)
    physics = DarcyResidual(
        pixels_per_dim=cfg.pixels_per_dim,
        fd_acc=cfg.fd_acc,
        pixels_at_boundary=cfg.pixels_at_boundary,
        reverse_d1=cfg.reverse_d1,
        domain_length=cfg.domain_length,
    )

    if args.data_split == "train":
        data = load_darcy_dataset(cfg.data_dir)
    else:
        data = load_darcy_dataset(cfg.valid_data_dir or cfg.data_dir)
    batch = jnp.asarray(np.stack([data[i] for i in range(args.batch)]))
    P = cfg.pixels_per_dim
    template = model.init(
        jax.random.key(0), jnp.zeros((1, P, P, cfg.model_channels)), jnp.zeros((1,), jnp.int32)
    )

    noise = jax.random.normal(jax.random.key(123), batch.shape)

    @jax.jit
    def residual_at_t(params, t_scalar):
        t = jnp.full((batch.shape[0],), t_scalar, jnp.int32)
        x_t = q_sample(sched, batch, t, noise)
        x0_pred = model.apply(params, x_t, t)
        res = jnp.abs(physics.residual(x0_pred)[..., 0]).mean()
        mse = jnp.mean(jnp.square(x0_pred - batch))
        return res, mse

    ladder = sorted(
        mdir.glob("model/checkpoint_*.msgpack"),
        key=lambda p: int(p.stem.split("_")[1]),
    )
    rows = []
    for path in ladder:
        step = int(path.stem.split("_")[1])
        raw = load_checkpoint(path)
        params = serialization.from_state_dict(template, raw["params"])
        ema = (
            serialization.from_state_dict(template, raw["ema_params"])
            if raw.get("ema_params")
            else None
        )
        row = {
            "step": step,
            "param_l2": tree_l2(params),
            "ema_l2": tree_l2(ema) if ema is not None else None,
            "raw_ema_dist": tree_dist(params, ema) if ema is not None else None,
            "residual_by_t": {},
            "data_mse_by_t": {},
        }
        eval_params = ema if ema is not None else params
        for t in args.t_grid:
            res, mse = residual_at_t(eval_params, t)
            row["residual_by_t"][str(t)] = float(res)
            row["data_mse_by_t"][str(t)] = float(mse)
        rows.append(row)
        print(
            f"step {step:>7}: |theta|={row['param_l2']:.1f} "
            f"|theta-ema|={row['raw_ema_dist']:.3f} "
            + " ".join(f"r@t{t}={row['residual_by_t'][str(t)]:.3e}" for t in args.t_grid),
            flush=True,
        )

    suffix = "" if args.data_split == "valid" else f"_{args.data_split}"
    out = args.out or str(mdir / f"drift_diagnosis{suffix}.json")
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as fh:
        json.dump(
            {
                "model_dir": str(mdir),
                "batch": args.batch,
                "data_split": args.data_split,
                "rows": rows,
            },
            fh,
            indent=2,
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
