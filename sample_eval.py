"""Evaluation driver for pretrained models.

TPU-native equivalent of the reference's `sample.py`: loads a checkpoint,
regenerates samples with the full correction options (CoCoGen M/N steps,
residual-gradient CFG), writes per-sample PNG/CSV/GIF +
sample_statistics.csv, and for mechanics sweeps the in-/out-of-distribution
test sets (test_level_1, test_level_2) accumulating residual / rel_CE / vf /
fm CSVs and printing medians/means with a wall-time report
(`/root/reference/sample.py:244-345`). The eval sweep is data-parallel over
the device mesh (batch sharded over 'dp').

    python sample_eval.py --model-dir trained_models/run_1 [--step N]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from physicsinformeddiffusionmodels_tpu.config import RunConfig
from physicsinformeddiffusionmodels_tpu.data import NpyFieldDataset, iter_batches
from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
from physicsinformeddiffusionmodels_tpu.ops.connected_components import floating_material
from physicsinformeddiffusionmodels_tpu.parallel import make_mesh, shard_batch
from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
from physicsinformeddiffusionmodels_tpu.physics.mechanics import MechanicsResidual
from physicsinformeddiffusionmodels_tpu.training import latest_checkpoint, load_checkpoint
from physicsinformeddiffusionmodels_tpu.utils import viz


def load_run(model_dir: str, step: int | None):
    model_dir = Path(model_dir)
    cfg = RunConfig.load(model_dir / "config.json")
    ckpt_dir = model_dir / "model"
    path = ckpt_dir / f"checkpoint_{step}.msgpack" if step is not None else latest_checkpoint(ckpt_dir)
    if path is None or not Path(path).exists():
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    raw = load_checkpoint(path)
    # portable (git-committable) exports store EMA weights as float16
    # (scripts/export_portable_checkpoint.py); restore them to float32 so
    # evaluation runs in the trained regime
    raw = jax.tree_util.tree_map(
        lambda x: x.astype(np.float32)
        if hasattr(x, "dtype") and x.dtype == np.float16
        else x,
        raw,
    )
    print(f"Checkpoint loaded from {path}")
    return cfg, raw


def eval_darcy(cfg: RunConfig, raw, out_dir: Path, no_samples: int, create_gif: bool, seed: int):
    import train as train_mod

    model = train_mod.build_model(cfg)
    # restore typed params through a template init
    key = jax.random.key(0)
    dummy = jnp.zeros((1, cfg.pixels_per_dim, cfg.pixels_per_dim, cfg.model_channels))
    template = model.init(key, dummy, jnp.zeros((1,), jnp.int32))
    from flax import serialization

    params = serialization.from_state_dict(template, raw["ema_params"] or raw["params"])

    sched = create_schedule(cfg.diff_steps)
    physics = DarcyResidual(
        pixels_per_dim=cfg.pixels_per_dim, fd_acc=cfg.fd_acc,
        pixels_at_boundary=cfg.pixels_at_boundary, reverse_d1=cfg.reverse_d1,
        domain_length=cfg.domain_length, periodic=cfg.bcs == "periodic",
    )
    sample_fn = train_mod.make_sample_fn(model, sched, physics, cfg, save_history=create_gif)
    t0 = time.time()
    out = sample_fn(params, jax.random.key(seed), no_samples)
    samples, residual = np.asarray(out[0]), out[1]
    history = np.asarray(out[2]) if create_gif else None
    res_b = np.abs(np.asarray(residual)).mean(axis=(1, 2))

    step_dir = out_dir / "validation"
    for s in range(no_samples):
        for c in range(samples.shape[-1]):
            viz.save_field_image(
                samples[s, :, :, c], str(step_dir / f"sample_{s}_{c}.png"),
                title=f"residual: {res_b[s]:.2e}",
            )
            viz.save_csv(samples[s, :, :, c], str(step_dir / f"sample_{s}" / f"sample_{c}.csv"))
            if history is not None:
                # denoising-trajectory GIF per sample/channel (`sample.py:213-236`)
                viz.image_history_to_gif(
                    history[:, s, :, :, c],
                    str(step_dir / f"sample_{s}" / f"sample_{c}.gif"),
                )
    with open(step_dir / "sample_statistics.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Sample Index", "Residuals (abs)"])
        for i, r in enumerate(res_b):
            w.writerow([i, r])
        w.writerow(["Mean", np.nanmean(res_b)])
    print(f"residual mean {np.nanmean(res_b):.3e} median {np.nanmedian(res_b):.3e}")
    print(f"Evaluation done (time: {time.strftime('%H:%M:%S', time.gmtime(time.time()-t0))}).")
    return res_b


def eval_mechanics(cfg: RunConfig, raw, out_dir: Path, no_samples: int, test_batches: int, seed: int, test_data_root: str | None = None, create_gif: bool = False):
    import train_mechanics as tm

    # build exactly like the train driver (in particular compute_dtype:
    # evaluating in f32 both diverges from the trained regime and trips a
    # backend Mosaic b32-transpose compiler bug in the fused attention
    # kernel at multi-tile N on the axon v5e toolchain)
    model = tm.build_mech_model(cfg)
    P = cfg.pixels_per_dim
    template = model.init(
        jax.random.key(0), jnp.zeros((1, P, P, cfg.model_channels)), jnp.zeros((1,), jnp.int32)
    )
    from flax import serialization

    params = serialization.from_state_dict(template, raw["ema_params"] or raw["params"])
    sched = create_schedule(cfg.diff_steps)
    mech = MechanicsResidual(pixels_per_dim=P)
    sample_fn = tm.make_mech_sample_fn(model, sched, mech, cfg)
    sample_fn_hist = (
        tm.make_mech_sample_fn(model, sched, mech, cfg, save_history=True)
        if create_gif
        else None
    )

    mesh = make_mesh(cfg.mesh_dp, cfg.mesh_tp)
    multi_device = mesh.devices.size > 1

    base = Path(test_data_root) if test_data_root else Path(cfg.data_dir).parent.parent
    t0 = time.time()
    key = jax.random.key(seed)
    for level in ("test_level_1", "test_level_2"):
        ddir = base / "test" / level / "fields"
        if not ddir.exists():
            raise FileNotFoundError(
                f"{ddir} not found — the mechanics eval sweep requires both "
                "test_level_1 (in-distribution) and test_level_2 "
                "(out-of-distribution) sets (`sample.py:244`); generate them "
                "with scripts/generate_mechanics_data.py"
            )
        ds = NpyFieldDataset(str(ddir))
        res_list, ce_list, vf_list, fm_list, fallback = [], [], [], [], 0
        for bi, batch in enumerate(iter_batches(ds, cfg.train_batch_size)):
            b = jnp.asarray(batch)
            if multi_device and b.shape[0] % mesh.shape["dp"] == 0:
                b = shard_batch(b, mesh)
            key, k = jax.random.split(key)
            history = None
            if bi == 0 and sample_fn_hist is not None:
                final, residual, compliance, ineq, topopt, history = sample_fn_hist(params, b, k)
                history = np.asarray(history)
            else:
                final, residual, compliance, ineq, topopt = sample_fn(params, b, k)
            # escalate CG-stalled samples to the exact host solve
            topopt = mech.topopt_eval_checked(topopt, np.asarray(b)[..., 6:10])
            fallback += topopt["n_solve_fallback"]
            res_b = np.abs(np.asarray(residual)).mean(axis=1)
            res_list.append(res_b)
            ce_list.append(np.asarray(topopt["rel_CE_error_full_batch"]))
            vf_list.append(np.asarray(topopt["vf_error_full_batch"]))
            fm_list.append(floating_material(np.asarray(topopt["rho_binarized"])))
            if bi == 0:
                # per-sample PNG/CSV (+ GIF) artifacts (`sample.py:174-241`)
                finals = np.asarray(final)
                comp = np.asarray(compliance)
                ldir = out_dir / level
                for s in range(min(len(finals), no_samples)):
                    for c in range(3):
                        viz.save_field_image(
                            finals[s, :, :, c],
                            str(ldir / f"sample_{s}_{c}.png"),
                            title=f"eq: {res_b[s]:.2e}\nopt: {comp[s]:.2f}",
                        )
                        viz.save_csv(
                            finals[s, :, :, c], str(ldir / f"sample_{s}" / f"sample_{c}.csv")
                        )
                        if history is not None:
                            viz.image_history_to_gif(
                                history[:, s, :, :, c],
                                str(ldir / f"sample_{s}" / f"sample_{c}.gif"),
                            )
            if test_batches != -1 and bi + 1 >= test_batches:
                break
        res = np.concatenate(res_list)
        ce = np.concatenate(ce_list)
        vfe = np.concatenate(vf_list)
        fm = np.concatenate(fm_list)
        ldir = out_dir / level
        ldir.mkdir(parents=True, exist_ok=True)
        np.savetxt(ldir / "residuals.csv", res, delimiter=",")
        np.savetxt(ldir / "rel_CE_error.csv", ce, delimiter=",")
        np.savetxt(ldir / "rel_vf_error.csv", vfe, delimiter=",")
        np.savetxt(ldir / "fm_error.csv", fm, delimiter=",")
        with open(ldir / "sample_statistics.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Sample Index", "Residuals (abs)", "rel_CE_error", "rel_vf_error", "fm"])
            for i in range(len(res)):
                w.writerow([i, res[i], ce[i], vfe[i], fm[i]])
            w.writerow(["Mean", np.nanmean(res), np.nanmean(ce), np.nanmean(vfe), np.nanmean(fm)])
        print(f"On {level}:")
        # median AND mean AND max for rel_CE: the OOD set has a heavy tail
        # (a few catastrophic designs) that a median alone hides; the
        # reference prints means alongside medians (`sample.py:342`)
        print(
            "CE median error:", np.median(ce), "CE mean error:", np.mean(ce),
            "CE max error:", np.max(ce), "VF mean error:", np.mean(vfe),
            "FM mean error:", np.mean(fm), "Mean residual:", np.mean(res),
            "Median residual:", np.median(res),
            f"(exact-solve fallbacks: {fallback}/{len(ce)})",
        )
    print(f"Evaluation done (time: {time.strftime('%H:%M:%S', time.gmtime(time.time()-t0))}).")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--no-samples", type=int, default=3)
    ap.add_argument("--test-batches", type=int, default=-1, help="-1 = full test sets")
    ap.add_argument("--create-gif", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--test-data-root", default=None,
                    help="mechanics: dir containing test/test_level_{1,2}/fields")
    # inference-time overrides: residual corrections only affect sampling,
    # so (like the reference, `sample.py:41-44`) they may be changed after
    # training without retraining
    ap.add_argument("--correction-mode", default=None, choices=["none", "x0", "xt"])
    ap.add_argument("--m-correction", type=int, default=None)
    ap.add_argument("--n-correction", type=int, default=None)
    ap.add_argument("--guidance-scale", type=float, default=None)
    ap.add_argument("--compute-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="override the training compute dtype at sampling "
                    "time (e.g. fp32 sampling of a bf16-trained model, to "
                    "separate denoiser drift from sampler rounding noise)")
    ap.add_argument("--dynamic-threshold", default=None, choices=["on", "off"],
                    help="override Imagen-style dynamic thresholding during "
                    "sampling (an inference-time lever against OOD blowups)")
    args = ap.parse_args()

    cfg, raw = load_run(args.model_dir, args.step)
    if args.correction_mode is not None:
        cfg.correction_mode = args.correction_mode
    if args.m_correction is not None:
        cfg.M_correction = args.m_correction
    if args.n_correction is not None:
        cfg.N_correction = args.n_correction
    # CoCoGen residual corrections are a darcy-only feature — in the
    # reference too: `residual_correction` exists only on ResidualsDarcy
    # (`residuals_darcy.py:209`); `residuals_mechanics_K.py` has no such
    # method, so the reference would crash if asked. Refuse to record
    # correction settings the mechanics sampler will not apply.
    if cfg.gov_eqs != "darcy" and cfg.correction_mode not in (None, "none"):
        print(
            f"WARNING: correction_mode={cfg.correction_mode!r} is darcy-only "
            "(no residual_correction op for mechanics, matching the "
            "reference); running UNCORRECTED and recording 'none'.",
            file=sys.stderr,
        )
        cfg.correction_mode = "none"
        cfg.M_correction = 0
        cfg.N_correction = 0
    if args.guidance_scale is not None:
        cfg.guidance_scale = args.guidance_scale
    if args.dynamic_threshold is not None:
        cfg.use_dynamic_threshold = args.dynamic_threshold == "on"
    if args.compute_dtype is not None:
        cfg.compute_dtype = args.compute_dtype
    out_dir = Path(args.model_dir) / "evaluation"
    i = 1
    while out_dir.exists():
        out_dir = Path(args.model_dir) / f"evaluation_{i}"
        i += 1
    out_dir.mkdir(parents=True)

    # self-describing provenance next to the metric CSVs: the exact settings
    # this sweep ran with (persist_results.py carries it into results/).
    # Written AFTER the eval completes — a crashed/timed-out eval must not
    # leave a settings-only dir that satisfies done-guards with no metrics
    # behind it (round-4 advisor finding); until then a *.pending file marks
    # the dir as in-flight.
    dev = jax.devices()[0]
    settings = json.dumps({
        "argv": sys.argv[1:],
        "model_dir": args.model_dir,
        "checkpoint_step": int(raw["step"]) if raw.get("step") is not None else None,
        "no_samples": args.no_samples,
        "test_batches": args.test_batches,
        "seed": args.seed,
        "correction_mode": cfg.correction_mode,
        "M_correction": cfg.M_correction,
        "N_correction": cfg.N_correction,
        "guidance_scale": cfg.guidance_scale,
        "use_dynamic_threshold": cfg.use_dynamic_threshold,
        "compute_dtype": cfg.compute_dtype,
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "n_devices": jax.device_count(),
    }, indent=2) + "\n"
    (out_dir / "eval_settings.json.pending").write_text(settings)

    if cfg.gov_eqs == "darcy":
        eval_darcy(cfg, raw, out_dir, args.no_samples, args.create_gif, args.seed)
    else:
        eval_mechanics(
            cfg, raw, out_dir, args.no_samples, args.test_batches, args.seed,
            args.test_data_root, create_gif=args.create_gif,
        )

    (out_dir / "eval_settings.json").write_text(settings)
    (out_dir / "eval_settings.json.pending").unlink(missing_ok=True)


if __name__ == "__main__":
    main()
