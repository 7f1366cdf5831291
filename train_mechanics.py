"""Mechanics (topology-optimization) study driver.

TPU-native equivalent of the reference's `main.py` mechanics branch:
conditional physics-informed diffusion over (u1, u2, rho) given
(vf, strain-energy-density, von-Mises, BCs, loads), with the FEM
equilibrium residual, compliance objective and volume-fraction constraint
in the loss, EMA-weighted sampling with topopt metrics (rel_CE / vf / fm).

Data layout: per-sample [65, 65, 10] npy files (reference channel order,
`data_utils.py:118`); generate synthetic data with
scripts/generate_mechanics_data.py.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from physicsinformeddiffusionmodels_tpu.config import RunConfig
from physicsinformeddiffusionmodels_tpu.diffusion import (
    LossWeights,
    create_schedule,
    ddim_sample_x0,
    p_sample_loop,
    pidm_loss,
    uniform_timesteps,
)
from physicsinformeddiffusionmodels_tpu.models.unet import UNet
from physicsinformeddiffusionmodels_tpu.ops.connected_components import floating_material
from physicsinformeddiffusionmodels_tpu.ops.reshape import resize_bilinear
from physicsinformeddiffusionmodels_tpu.parallel import make_mesh, shard_batch, shard_params
from physicsinformeddiffusionmodels_tpu.physics.mechanics import (
    MechanicsBatch,
    MechanicsResidual,
    split_mechanics_batch,
)
from physicsinformeddiffusionmodels_tpu.training import (
    MetricsLogger,
    create_train_state,
    make_optimizer,
    make_chunked_resident_step,
    make_device_resident_step,
    make_train_step,
    install_graceful_stop,
    restore_train_state,
    save_checkpoint,
)
from physicsinformeddiffusionmodels_tpu.utils import viz


def build_mech_model(cfg: RunConfig, mesh=None) -> UNet:
    tp_on = mesh is not None and cfg.mesh_tp > 1
    return UNet(
        dim=cfg.unet_dim,
        channels=cfg.model_channels,
        out_dim=cfg.output_channels,
        sigmoid_last_channel=True,
        frame_attention=cfg.frame_attention,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None,
        fp32_head=cfg.fp32_head and cfg.compute_dtype == "bfloat16",
        tp_mesh=mesh if tp_on and cfg.tp_shard_activations else None,
        sp_mesh=mesh if tp_on and cfg.seq_parallel_attn else None,
    )


def model_input_from_state(noisy_solution, cond: MechanicsBatch, P: int):
    """Assemble the 10-channel 64x64 model input from a noisy 65x65 solution
    state (`residuals_mechanics_K.py:170-189`): resize(cat(noisy, cond)) ++
    resize(bcs)."""
    six = jnp.concatenate([noisy_solution, cond.conditioning], axis=-1)
    six_red = resize_bilinear(six, P)
    bcs_red = resize_bilinear(cond.bcs, P)
    return jnp.concatenate([six_red, bcs_red], axis=-1)


def build_mechanics_loss_fn(model: UNet, sched, mech: MechanicsResidual, cfg: RunConfig):
    weights = LossWeights(cfg.c_data, cfg.c_residual, cfg.c_ineq, cfg.lambda_opt)
    P = cfg.pixels_per_dim

    def loss_fn(params, batch, key, step):
        mb = split_mechanics_batch(batch)
        vf = mb.conditioning[..., 0][:, 0, 0]
        t_key, n_key = jax.random.split(key)
        t = uniform_timesteps(t_key, batch.shape[0], cfg.diff_steps)

        def denoise(noisy_solution_65, tt):
            """noisy 65x65 solution -> raw 64x64 (u1, u2, rho) prediction."""
            return model.apply(params, model_input_from_state(noisy_solution_65, mb, P), tt)

        sampler = None
        if cfg.use_ddim_x0:
            # Reference semantics (`denoising_utils.py:744-753`): the DDIM
            # chain re-queries the model on the ORIGINAL noisy input at the
            # ladder times; only the DDIM algebra chains. Expressed here by
            # a denoise closure that ignores the chained state.
            def sampler(x_t_65, tt, k):
                fixed_input = model_input_from_state(x_t_65, mb, P)
                x0_64 = resize_bilinear(x_t_65, P)

                def fixed_denoise(_, ttt):
                    return model.apply(params, fixed_input, ttt)

                # (x0_sample, first_model_out): the chain's first call doubles
                # as the direct prediction for the data loss
                # (`denoising_utils.py:744-753`)
                return ddim_sample_x0(
                    sched, fixed_denoise, x0_64, tt, k, ddim_steps=cfg.ddim_steps
                )

        return pidm_loss(
            sched,
            mb.solution,  # x0 target at 65x65 (`denoising_utils.py:630-672`)
            t,
            n_key,
            denoise_fn=denoise,
            physics_fn=lambda x0_64: mech.evaluate(x0_64, mb.bcs, vf),
            weights=weights,
            pred_mode="x0",
            x0_sampler=sampler,
            model_out_transform=mech.model_out_to_nodes,
        )

    return loss_fn


def make_mech_sample_fn(model: UNet, sched, mech: MechanicsResidual, cfg: RunConfig,
                        save_history: bool = False):
    """Conditional ancestral sampling at the 65x65 state resolution; each
    step resizes for the model and converts the prediction back
    (`denoising_utils.py:388-455` with `residuals_mechanics_K.compute_residual`).
    With ``save_history`` the [T, B, 65, 65, 3] denoising trajectory is
    appended to the outputs (for GIF dumps, `sample.py:213-236`)."""
    P = cfg.pixels_per_dim

    @jax.jit
    def sample_fn(params, batch, key):
        mb = split_mechanics_batch(batch)
        vf = mb.conditioning[..., 0][:, 0, 0]
        B = batch.shape[0]

        def denoise(x65, t):
            x0_64 = model.apply(params, model_input_from_state(x65, mb, P), t)
            return mech.model_out_to_nodes(x0_64)

        result = p_sample_loop(
            sched, denoise, (B, P + 1, P + 1, 3), key,
            use_dynamic_threshold=cfg.use_dynamic_threshold,
            save_history=save_history,
        )
        # final state at t=0 == converted x0 prediction (posterior coef1[0]=1)
        final = result.x
        disp65 = final[..., :2]
        rho_e = final[:, :-1, :-1, 2].reshape(B, -1)
        residual, u, f, mask = mech.residual_from_fields(disp65, rho_e, mb.bcs)
        compliance = mech.compliance(u, rho_e, mask)
        ineq = rho_e.mean(axis=1) - vf
        x0_64 = jnp.concatenate(
            [resize_bilinear(disp65, P), final[:, :-1, :-1, 2:3]], axis=-1
        )
        topopt = mech.topopt_eval(x0_64, mb) if cfg.topopt_eval else {}
        if save_history:
            return final, residual, compliance, ineq, topopt, result.history
        return final, residual, compliance, ineq, topopt

    return sample_fn


def run_mechanics(cfg: RunConfig):
    from physicsinformeddiffusionmodels_tpu.data import NpyFieldDataset, cycle_batches

    out_dir = Path(cfg.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg.save(out_dir / "config.json")

    ds = NpyFieldDataset(cfg.data_dir)
    ds_valid = NpyFieldDataset(cfg.valid_data_dir)
    print(f"train samples: {len(ds)}, valid: {len(ds_valid)}")
    dl = cycle_batches(ds, cfg.train_batch_size)
    dl_valid = cycle_batches(ds_valid, min(cfg.train_batch_size, len(ds_valid)))

    sched = create_schedule(cfg.diff_steps)
    mech = MechanicsResidual(pixels_per_dim=cfg.pixels_per_dim)
    mesh = make_mesh(cfg.mesh_dp, cfg.mesh_tp, n_slices=cfg.mesh_slices)
    model = build_mech_model(cfg, mesh)

    key = jax.random.key(cfg.seed)
    key, init_key = jax.random.split(key)
    P = cfg.pixels_per_dim
    params = model.init(
        init_key, jnp.zeros((1, P, P, cfg.model_channels)), jnp.zeros((1,), jnp.int32)
    )
    print(
        "Number of trainable parameters:",
        sum(x.size for x in jax.tree_util.tree_leaves(params)),
    )

    multi_device = mesh.devices.size > 1
    if multi_device:
        params = shard_params(params, mesh)

    tx = make_optimizer(cfg.lr, cfg.grad_clip, schedule=cfg.lr_schedule,
                        total_steps=cfg.train_iterations,
                        final_frac=cfg.lr_final_frac)
    state = create_train_state(params, tx)
    start_it = 0
    if cfg.resume:
        state, start_it = restore_train_state(out_dir / "model", state)
    loss_fn = build_mechanics_loss_fn(model, sched, mech, cfg)
    train_step = make_train_step(loss_fn, tx, ema_mu=cfg.ema_decay, ema_start=cfg.ema_start)
    eval_loss = jax.jit(lambda p, b, k: loss_fn(p, b, k, 0)[1])
    sample_fn = make_mech_sample_fn(model, sched, mech, cfg)

    # single-device: dataset lives in HBM, batch gathered inside the step
    data_dev = None
    train_step_chunked = None
    if not multi_device:
        data_dev = jnp.asarray(ds.stacked())
        train_step_resident = make_device_resident_step(
            loss_fn, tx, cfg.train_batch_size,
            ema_mu=cfg.ema_decay, ema_start=cfg.ema_start,
        )
        if cfg.chunk_steps > 1:
            cfg.validate_chunking()
            train_step_chunked = make_chunked_resident_step(
                loss_fn, tx, cfg.train_batch_size, cfg.chunk_steps,
                ema_mu=cfg.ema_decay, ema_start=cfg.ema_start,
            )
    elif cfg.chunk_steps > 1:
        print(
            f"warning: --chunk-steps {cfg.chunk_steps} is single-device only; "
            "falling back to per-step dispatch on the mesh",
            flush=True,
        )

    logger = MetricsLogger(str(out_dir), run_name=cfg.name)
    should_stop = install_graceful_stop()
    t0 = time.time()
    key, train_key = jax.random.split(key)
    chunk = cfg.chunk_steps
    it = start_it
    while it <= cfg.train_iterations:
        if (
            train_step_chunked is not None
            and it % chunk == 1
            and it + chunk - 1 <= cfg.train_iterations
        ):
            # one dispatch advances `chunk` steps; chunk ends land exactly on
            # the log/eval/sample boundaries (all freqs are chunk multiples)
            state, aux = train_step_chunked(state, data_dev, train_key)
            it += chunk - 1
        elif data_dev is not None:
            state, aux = train_step_resident(state, data_dev, train_key)
        else:
            batch = shard_batch(jnp.asarray(next(dl)), mesh)
            state, aux = train_step(state, batch, train_key)

        if it % cfg.log_freq == 0:
            logger.log(
                {
                    "loss": aux.loss, "loss_data": aux.data_loss,
                    "residual_mean_abs": aux.residual_mean_abs,
                    "loss_inequality": aux.ineq_mean,
                    "loss_optimization": aux.opt_mean,
                },
                step=it,
            )
        if it % cfg.test_eval_freq == 0:
            key, k = jax.random.split(key)
            aux_t = eval_loss(state.ema_params, jnp.asarray(next(dl_valid)), k)
            print(
                f"it {it}: loss={float(aux.loss):.3e} test={float(aux_t.loss):.3e} "
                f"res={float(aux.residual_mean_abs):.3e} ({time.time()-t0:.0f}s)"
            )
            logger.log({"loss_test": aux_t.loss, "residual_mean_abs_test": aux_t.residual_mean_abs}, step=it)
            logger.flush()

        if (it % cfg.sample_freq == 0 and it > 0) or it == cfg.train_iterations:
            key, k = jax.random.split(key)
            vb = jnp.asarray(next(dl_valid))[: cfg.no_samples]
            final, residual, compliance, ineq, topopt = sample_fn(state.ema_params, vb, k)
            res_b = np.abs(np.asarray(residual)).mean(axis=1)
            metrics = {
                "residual_mean_abs_samples": np.nanmean(res_b),
                "residual_median_abs_samples": np.nanmedian(res_b),
            }
            if cfg.topopt_eval:
                # escalate CG-stalled samples to the exact host solve
                topopt = mech.topopt_eval_checked(topopt, np.asarray(vb)[..., 6:10])
                fm = floating_material(np.asarray(topopt["rho_binarized"]))
                metrics.update(
                    rel_CE_error=np.nanmean(np.asarray(topopt["rel_CE_error_full_batch"])),
                    rel_vf_error=np.nanmean(np.asarray(topopt["vf_error_full_batch"])),
                    fm_error=float(fm.mean()),
                    n_solve_fallback=topopt["n_solve_fallback"],
                )
            logger.log(metrics, step=it)
            step_dir = out_dir / "training" / f"step_{it}"
            finals = np.asarray(final)
            for s in range(finals.shape[0]):
                for c in range(3):
                    viz.save_field_image(
                        finals[s, :, :, c], str(step_dir / f"sample_{s}_{c}.png"),
                        title=f"eq: {res_b[s]:.2e}\nopt: {float(np.asarray(compliance)[s]):.2f}",
                    )
                    viz.save_csv(finals[s, :, :, c], str(step_dir / f"sample_{s}" / f"sample_{c}.csv"))
            # Intermediate saves skip optimizer state: at unet_dim=128 the
            # Adam moments double the checkpoint to 2.1 GB, and the
            # device->host pull over a tunneled chip costs ~380 s per dump.
            # Eval/diagnosis need params+EMA only; the final and
            # SIGTERM saves below stay full so --resume restores exactly
            # (restore_train_state falls back to a fresh optimizer if the
            # newest checkpoint is a slim one).
            save_checkpoint(
                out_dir / "model", it,
                params=state.params, ema_params=state.ema_params,
                opt_state=state.opt_state if it == cfg.train_iterations else None,
                config=dataclasses.asdict(cfg),
            )
            print(f"it {it}: sampled; {metrics}")

        if should_stop():
            save_checkpoint(
                out_dir / "model", it,
                params=state.params, ema_params=state.ema_params,
                opt_state=state.opt_state, config=dataclasses.asdict(cfg),
            )
            print(f"it {it}: checkpoint saved on shutdown request", flush=True)
            break

        it += 1

    logger.close()
    return state


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="mech_run")
    ap.add_argument("--iterations", type=int, default=600_000)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--pixels-per-dim", type=int, default=64)
    ap.add_argument("--unet-dim", type=int, default=None)
    ap.add_argument("--data-dir", default="./data/mechanics/train/fields")
    ap.add_argument("--valid-data-dir", default="./data/mechanics/test/valid/fields")
    ap.add_argument("--x0-estimation", default="mean", choices=["mean", "sample"])
    ap.add_argument("--c-residual", type=float, default=1e-3)
    ap.add_argument("--sample-freq", type=int, default=20000)
    ap.add_argument("--test-eval-freq", type=int, default=500)
    ap.add_argument("--no-samples", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=1,
                    help=">1: optimizer steps per device dispatch (lax.scan); "
                    "bit-identical stepping, amortises dispatch latency; "
                    "single-device only (ignored with a warning on a mesh)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint of this run name")
    ap.add_argument("--mesh-dp", type=int, default=None)
    ap.add_argument("--mesh-tp", type=int, default=1)
    ap.add_argument("--mesh-slices", type=int, default=1,
                    help="multislice data-parallel axis over DCN (default 1)")
    ap.add_argument("--tp-shard-activations", action="store_true",
                    help="with --mesh-tp>1: constrain wide-stage UNet "
                    "activations over 'tp' (real tensor parallelism)")
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"],
                    help="'constant' = reference recipe; 'cosine' decays to "
                    "lr-final-frac*lr over the run")
    ap.add_argument("--lr-final-frac", type=float, default=0.1)
    ap.add_argument("--seq-parallel-attn", action="store_true",
                    help="with --mesh-tp>1: sequence-parallel linear "
                    "attention over 'tp'")
    ap.add_argument("--fp32-head", action="store_true",
                    help="with bf16 compute: final block + 1x1 conv in fp32 "
                    "(removes the FEM-residual bf16 output-noise floor; "
                    "docs/DARCY_DRIFT.md)")
    a = ap.parse_args()
    cfg = RunConfig(
        gov_eqs="mechanics", name=a.name, train_iterations=a.iterations,
        train_batch_size=a.batch_size, pixels_per_dim=a.pixels_per_dim,
        data_dir=a.data_dir, valid_data_dir=a.valid_data_dir,
        x0_estimation=a.x0_estimation, c_residual=a.c_residual,
        sample_freq=a.sample_freq, test_eval_freq=a.test_eval_freq,
        no_samples=a.no_samples, chunk_steps=a.chunk_steps,
        c_ineq=1e-3, lambda_opt=1e-6,
        unet_dim=a.unet_dim, resume=a.resume,
        mesh_dp=a.mesh_dp, mesh_tp=a.mesh_tp,
        mesh_slices=a.mesh_slices,
        tp_shard_activations=a.tp_shard_activations,
        seq_parallel_attn=a.seq_parallel_attn,
        lr_schedule=a.lr_schedule, lr_final_frac=a.lr_final_frac,
        fp32_head=a.fp32_head,
    )
    run_mechanics(cfg)
