"""Measure bf16 gradient fidelity per loss term on the Darcy checkpoint ladder.

Late-training drift diagnosis (docs/DARCY_DRIFT.md): the residual
log-likelihood term's own value GROWS over the final 100k steps of the
cosine run even at lr ~1e-5, and the drift appears on train inputs as much
as valid ones — so it is neither overfitting nor the bare Adam-tail norm
walk. The remaining mechanism suspects are (a) bf16 activation precision
corrupting the gradient of the stiff two-derivative-order FD residual term
(the torch reference trains fp32 — torch default dtype, no autocast
anywhere in `/root/reference/src`), and
(b) the sigma_t^-2 likelihood weighting making small-t residual gradients
heavy-tailed regardless of precision.

This probe separates them: at each checkpoint it computes the gradient of
the *data* term and the *residual* term in bf16 compute and in fp32
compute from identical fp32 weights, identical batch, noise and t, and
reports the cosine similarity and norm ratio between the two. A term whose
bf16 gradient decorrelates from its fp32 gradient injects rounding-noise
updates at every step — integrated over 100k+ steps by Adam's unit scaling
that is a secular random walk the loss value registers as growth.

Usage (CPU is fine; fp32 reference path is exact there):
    JAX_PLATFORMS=cpu python scripts/probe_grad_precision.py \
        --model-dir trained_models/darcy_300k_cosine --steps 40000 300000
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def flat(tree) -> jax.Array:
    return jnp.concatenate(
        [l.astype(jnp.float32).ravel() for l in jax.tree_util.tree_leaves(tree)]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="trained_models/darcy_300k_cosine")
    ap.add_argument("--steps", type=int, nargs="*", default=[40000, 300000])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t-grid", type=int, nargs="*", default=[5, 25, 75])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import train as train_mod
    from flax import serialization
    from physicsinformeddiffusionmodels_tpu.config import RunConfig
    from physicsinformeddiffusionmodels_tpu.data import load_darcy_dataset
    from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
    from physicsinformeddiffusionmodels_tpu.diffusion.losses import (
        LossWeights,
        pidm_loss,
    )
    from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
    from physicsinformeddiffusionmodels_tpu.training import load_checkpoint

    mdir = Path(args.model_dir)
    cfg = RunConfig.load(mdir / "config.json")
    sched = create_schedule(cfg.diff_steps)
    physics = DarcyResidual(
        pixels_per_dim=cfg.pixels_per_dim,
        fd_acc=cfg.fd_acc,
        pixels_at_boundary=cfg.pixels_at_boundary,
        reverse_d1=cfg.reverse_d1,
        domain_length=cfg.domain_length,
    )

    # two builds of the same architecture: bf16 compute vs fp32 compute
    import dataclasses

    cfg_f32 = dataclasses.replace(cfg, compute_dtype="float32")
    model_bf16 = train_mod.build_model(cfg)
    model_f32 = train_mod.build_model(cfg_f32)
    # hybrid arm: bf16 body + fp32 final block/conv (the --fp32-head lever).
    # If its residual-term gradient re-correlates with fp32, the bf16
    # corruption enters at the output quantization, not the body matmuls.
    model_head = train_mod.build_model(dataclasses.replace(cfg, fp32_head=True))

    data = load_darcy_dataset(cfg.data_dir)
    batch = jnp.asarray(np.stack([data[i] for i in range(args.batch)]))
    P = cfg.pixels_per_dim
    template = model_f32.init(
        jax.random.key(0), jnp.zeros((1, P, P, cfg.model_channels)), jnp.zeros((1,), jnp.int32)
    )
    noise_key = jax.random.key(7)

    def term_grad(model, params, t_scalar, w: LossWeights):
        def loss(p):
            t = jnp.full((batch.shape[0],), t_scalar, jnp.int32)

            def denoise(x, tt):
                return model.apply(p, x, tt)

            val, _ = pidm_loss(
                sched, batch, t, noise_key,
                denoise_fn=denoise, physics_fn=physics,
                weights=w, pred_mode="x0",
            )
            return val

        return jax.grad(loss)(params)

    term_grad = jax.jit(term_grad, static_argnums=(0, 3))
    DATA = LossWeights(1.0, 0.0, 0.0, 0.0)
    RES = LossWeights(0.0, 1.0, 0.0, 0.0)

    rows = []
    for step in args.steps:
        raw = load_checkpoint(mdir / "model" / f"checkpoint_{step}.msgpack")
        params = serialization.from_state_dict(template, raw["params"])
        row = {"step": step, "terms": {}}
        for name, w in (("data", DATA), ("residual", RES)):
            per_t = {}
            for t in args.t_grid:
                g32 = flat(term_grad(model_f32, params, t, w))
                g16 = flat(term_grad(model_bf16, params, t, w))
                ghd = flat(term_grad(model_head, params, t, w))
                n32 = jnp.linalg.norm(g32)

                def _cos(g):
                    return float(
                        jnp.vdot(g32, g) / (n32 * jnp.linalg.norm(g) + 1e-30)
                    )

                per_t[str(t)] = {
                    "cos_sim": _cos(g16),
                    "cos_sim_fp32head": _cos(ghd),
                    "norm_f32": float(n32),
                    "norm_bf16": float(jnp.linalg.norm(g16)),
                    "norm_fp32head": float(jnp.linalg.norm(ghd)),
                }
                print(
                    f"step {step:>7} {name:>8} t={t:>3}: "
                    f"cos(bf16)={per_t[str(t)]['cos_sim']:+.4f} "
                    f"cos(head)={per_t[str(t)]['cos_sim_fp32head']:+.4f} "
                    f"|g32|={per_t[str(t)]['norm_f32']:.3e} "
                    f"|g16|={per_t[str(t)]['norm_bf16']:.3e}",
                    flush=True,
                )
            row["terms"][name] = per_t
        rows.append(row)

    out = args.out or str(mdir / "grad_precision_probe.json")
    with open(out, "w") as fh:
        json.dump({"model_dir": str(mdir), "batch": args.batch, "rows": rows}, fh, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
