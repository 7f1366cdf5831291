"""Full-study training driver (Darcy flow / mechanics).

TPU-native equivalent of the reference's `main.py`: physics-informed
diffusion training with data-parallel sharding over the device mesh,
EMA-weighted periodic evaluation and sampling, residual statistics dumps,
and structured checkpoints.

    python train.py --gov-eqs darcy --iterations 300000
    JAX_PLATFORMS=cpu python train.py --gov-eqs darcy --iterations 50 --batch-size 4  # smoke
"""

from __future__ import annotations

import argparse
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
from physicsinformeddiffusionmodels_tpu.parallel import make_mesh, shard_batch, shard_params
from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
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


def build_model(cfg: RunConfig, mesh=None) -> UNet:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    tp_on = mesh is not None and cfg.mesh_tp > 1
    return UNet(
        dim=cfg.unet_dim,
        channels=cfg.model_channels,
        out_dim=cfg.output_channels,
        sigmoid_last_channel=cfg.sigmoid_last_channel,
        padding_mode="circular" if cfg.bcs == "periodic" else "zeros",
        self_condition=cfg.self_condition,
        frame_attention=cfg.frame_attention,
        dtype=dtype,
        fp32_head=cfg.fp32_head and dtype is not None,
        tp_mesh=mesh if tp_on and cfg.tp_shard_activations else None,
        sp_mesh=mesh if tp_on and cfg.seq_parallel_attn else None,
    )


def build_darcy_loss_fn(model: UNet, sched, physics: DarcyResidual, cfg: RunConfig):
    """Loss closure for the Darcy study (`denoising_utils.py:616-710` with
    `residuals_darcy.compute_residual` as the physics callback)."""
    weights = LossWeights(cfg.c_data, cfg.c_residual, cfg.c_ineq, cfg.lambda_opt)

    def loss_fn(params, batch, key, step):
        t_key, n_key, m_key = jax.random.split(key, 3)
        t = uniform_timesteps(t_key, batch.shape[0], cfg.diff_steps)

        if cfg.residual_grad_guidance:
            # conditioning channel = d mean|r| / d x of the *noisy* state,
            # null-masked with p=0.1 during training
            # (`residuals_darcy.py:116-126`, `unet_model.py:542-587`)
            def denoise(x, tt):
                dr_dx = physics.residual_gradient(x)
                return model.apply(
                    params, x, tt, cond=dr_dx,
                    null_cond_prob=cfg.null_cond_prob, rng=m_key,
                )
        else:
            def denoise(x, tt):
                return model.apply(params, x, tt)

        sampler = None
        if cfg.use_ddim_x0:
            # returns (x0_sample, first_model_out); the first chain call is
            # the direct model evaluation at (x_t, t), reused as the data-loss
            # target (`denoising_utils.py:744-753`) — no duplicate call.
            # Full-study reference semantics (`denoising_utils.py:746-757`):
            # the model is re-queried on the ORIGINAL noisy input at the
            # ladder times — only the DDIM algebra chains (the toy engine
            # chains the model input instead, `denoising_toy_utils.py:324`).
            def sampler(x_t, tt, k):
                def fixed_denoise(_, ttt):
                    return denoise(x_t, ttt)

                return ddim_sample_x0(
                    sched, fixed_denoise, x_t, tt, k, ddim_steps=cfg.ddim_steps
                )

        return pidm_loss(
            sched, batch, t, n_key,
            denoise_fn=denoise,
            physics_fn=physics,
            weights=weights,
            pred_mode="x0",
            x0_sampler=sampler,
        )

    return loss_fn


def make_sample_fn(model: UNet, sched, physics, cfg: RunConfig, save_history: bool = False):
    """Jitted ancestral sampling with optional CoCoGen corrections and
    residual-gradient CFG (`main.py:220-225`). With ``save_history`` the
    full [T, B, H, W, C] denoising trajectory is returned as a third output
    (for GIF dumps, `sample.py:213-236`)."""

    use_correction = cfg.correction_mode in ("x0", "xt") and (
        cfg.N_correction or cfg.M_correction
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def sample_fn(params, key, n):
        if cfg.residual_grad_guidance:
            def denoise(x, t):
                dr_dx = physics.residual_gradient(x)
                logits = model.apply(params, x, t, cond=dr_dx, null_cond_prob=0.0)
                null_logits = model.apply(params, x, t, cond=dr_dx, null_cond_prob=1.0)
                return null_logits + (logits - null_logits) * cfg.guidance_scale
        else:
            def denoise(x, t):
                return model.apply(params, x, t)

        corr = (lambda x: physics.residual_correction(x)[0]) if use_correction else None
        result = p_sample_loop(
            sched, denoise,
            (n, cfg.pixels_per_dim, cfg.pixels_per_dim, cfg.output_channels),
            key,
            use_dynamic_threshold=cfg.use_dynamic_threshold,
            correction_fn=corr,
            correction_mode=cfg.correction_mode,
            n_correction=cfg.N_correction,
            m_correction=cfg.M_correction,
            save_history=save_history,
        )
        residual = physics.residual(result.x)
        if save_history:
            return result.x, residual, result.history
        return result.x, residual

    return sample_fn


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gov-eqs", default="darcy", choices=["darcy", "mechanics"])
    ap.add_argument("--name", default="run_1")
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--x0-estimation", default=None, choices=["mean", "sample"])
    ap.add_argument("--c-residual", type=float, default=None)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--valid-data-dir", default=None)
    ap.add_argument("--sample-freq", type=int, default=None)
    ap.add_argument("--test-eval-freq", type=int, default=None)
    ap.add_argument("--compute-dtype", default=None)
    ap.add_argument("--fp32-head", action="store_true",
                    help="with bf16 compute: final block + 1x1 conv in fp32 "
                    "(removes the FD-residual bf16 output-noise floor; "
                    "docs/DARCY_DRIFT.md)")
    ap.add_argument("--pixels-per-dim", type=int, default=None)
    ap.add_argument("--no-samples", type=int, default=None)
    ap.add_argument("--chunk-steps", type=int, default=None,
                    help=">1: optimizer steps per device dispatch (lax.scan); "
                    "bit-identical stepping, amortises dispatch latency; "
                    "single-device only (ignored with a warning on a mesh)")
    ap.add_argument("--residual-grad-guidance", action="store_true")
    ap.add_argument("--lr-schedule", default=None, choices=["constant", "cosine"],
                    help="'constant' = reference recipe; 'cosine' decays to "
                    "lr-final-frac*lr over the run (lever against late-"
                    "training sampled-residual degradation)")
    ap.add_argument("--lr-final-frac", type=float, default=None)
    ap.add_argument("--mesh-dp", type=int, default=None,
                    help="data-parallel mesh size (default: all devices / tp)")
    ap.add_argument("--mesh-tp", type=int, default=None,
                    help="tensor-parallel mesh size (default 1)")
    ap.add_argument("--mesh-slices", type=int, default=None,
                    help="multislice data-parallel axis over DCN (default 1)")
    ap.add_argument("--tp-shard-activations", action="store_true",
                    help="with --mesh-tp>1: constrain wide-stage UNet "
                    "activations over 'tp' (real tensor parallelism)")
    ap.add_argument("--seq-parallel-attn", action="store_true",
                    help="with --mesh-tp>1: sequence-parallel linear "
                    "attention over 'tp' (scales past 64^2 per chip)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint of this run name")
    ap.add_argument("--model-yaml", default=None,
                    help="reference-format model.yaml to configure the run")
    args = ap.parse_args(argv)

    kw = {"gov_eqs": args.gov_eqs, "name": args.name}
    for k_arg, k_cfg in [
        ("iterations", "train_iterations"), ("batch_size", "train_batch_size"),
        ("x0_estimation", "x0_estimation"), ("c_residual", "c_residual"),
        ("data_dir", "data_dir"), ("valid_data_dir", "valid_data_dir"),
        ("sample_freq", "sample_freq"), ("test_eval_freq", "test_eval_freq"),
        ("compute_dtype", "compute_dtype"), ("pixels_per_dim", "pixels_per_dim"),
        ("no_samples", "no_samples"), ("chunk_steps", "chunk_steps"),
        ("mesh_dp", "mesh_dp"), ("mesh_tp", "mesh_tp"),
        ("mesh_slices", "mesh_slices"),
        ("lr_schedule", "lr_schedule"), ("lr_final_frac", "lr_final_frac"),
    ]:
        v = getattr(args, k_arg)
        if v is not None:
            kw[k_cfg] = v
    if args.fp32_head:
        kw["fp32_head"] = True
    if args.tp_shard_activations:
        kw["tp_shard_activations"] = True
    if args.seq_parallel_attn:
        kw["seq_parallel_attn"] = True
    if args.residual_grad_guidance:
        kw["residual_grad_guidance"] = True
    if args.resume:
        kw["resume"] = True
    if args.model_yaml:
        cfg = RunConfig.from_model_yaml(args.model_yaml, **kw)
    else:
        cfg = RunConfig(**kw)

    if cfg.gov_eqs == "mechanics":
        from train_mechanics import run_mechanics  # noqa: deferred heavy import

        return run_mechanics(cfg)
    return run_darcy(cfg)


def run_darcy(cfg: RunConfig):
    from physicsinformeddiffusionmodels_tpu.data import cycle_batches, load_darcy_dataset

    out_dir = Path(cfg.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg.save(out_dir / "config.json")

    ds = load_darcy_dataset(cfg.data_dir)
    ds_valid = load_darcy_dataset(cfg.valid_data_dir)
    print(f"train samples: {len(ds)}, valid: {len(ds_valid)}")
    dl = cycle_batches(ds, cfg.train_batch_size)
    dl_valid = cycle_batches(ds_valid, min(cfg.train_batch_size, len(ds_valid)))

    sched = create_schedule(cfg.diff_steps)
    physics = DarcyResidual(
        pixels_per_dim=cfg.pixels_per_dim,
        fd_acc=cfg.fd_acc,
        pixels_at_boundary=cfg.pixels_at_boundary,
        reverse_d1=cfg.reverse_d1,
        domain_length=cfg.domain_length,
        periodic=cfg.bcs == "periodic",
    )
    mesh = make_mesh(cfg.mesh_dp, cfg.mesh_tp, n_slices=cfg.mesh_slices)
    model = build_model(cfg, mesh)

    key = jax.random.key(cfg.seed)
    key, init_key = jax.random.split(key)
    dummy = jnp.zeros((1, cfg.pixels_per_dim, cfg.pixels_per_dim, cfg.model_channels))
    params = model.init(init_key, dummy, jnp.zeros((1,), jnp.int32))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"Number of trainable parameters: {n_params}")

    multi_device = mesh.devices.size > 1
    if multi_device:
        params = shard_params(params, mesh)
        print(f"mesh: {dict(mesh.shape)}")

    tx = make_optimizer(cfg.lr, cfg.grad_clip, schedule=cfg.lr_schedule,
                        total_steps=cfg.train_iterations,
                        final_frac=cfg.lr_final_frac)
    state = create_train_state(params, tx)
    start_it = 0
    if cfg.resume:
        state, start_it = restore_train_state(out_dir / "model", state)
    loss_fn = build_darcy_loss_fn(model, sched, physics, cfg)
    train_step = make_train_step(loss_fn, tx, ema_mu=cfg.ema_decay, ema_start=cfg.ema_start)
    # single-device: keep the whole (few-MB) dataset in HBM and gather the
    # minibatch inside the jitted step — no per-step host work/H2D
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
    eval_loss = jax.jit(lambda params, batch, key: loss_fn(params, batch, key, 0)[1])
    sample_fn = make_sample_fn(model, sched, physics, cfg)

    logger = MetricsLogger(str(out_dir), run_name=cfg.name)
    should_stop = install_graceful_stop()

    t0 = time.time()
    # one base key for the whole run: the per-step key derives inside the
    # jitted step from (base, state.step) — no per-step split dispatch
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
                },
                step=it,
            )
        if it % cfg.test_eval_freq == 0:
            key, k = jax.random.split(key)
            vb = jnp.asarray(next(dl_valid))
            aux_t = eval_loss(state.ema_params, vb, k)
            print(
                f"it {it}: loss={float(aux.loss):.3e} test={float(aux_t.loss):.3e} "
                f"res|_train={float(aux.residual_mean_abs):.3e} ({time.time()-t0:.0f}s)"
            )
            logger.log(
                {
                    "loss_test": aux_t.loss, "loss_data_test": aux_t.data_loss,
                    "residual_mean_abs_test": aux_t.residual_mean_abs,
                },
                step=it,
            )
            logger.flush()

        if (it % cfg.sample_freq == 0 and it > 0) or it == cfg.train_iterations:
            key, k = jax.random.split(key)
            samples, residual = sample_fn(state.ema_params, k, cfg.no_samples)
            res_b = np.abs(np.asarray(residual)).mean(axis=(1, 2))
            logger.log(
                {
                    "residual_mean_abs_samples": np.nanmean(res_b),
                    "residual_median_abs_samples": np.nanmedian(res_b),
                },
                step=it,
            )
            step_dir = out_dir / "training" / f"step_{it}"
            samples_np = np.asarray(samples)
            for s in range(samples_np.shape[0]):
                for c in range(samples_np.shape[-1]):
                    viz.save_field_image(
                        samples_np[s, :, :, c],
                        str(step_dir / f"sample_{s}_{c}.png"),
                        title=f"eq: {res_b[s]:.2e}",
                    )
                    viz.save_csv(samples_np[s, :, :, c], str(step_dir / f"sample_{s}" / f"sample_{c}.csv"))
            import csv as _csv

            with open(step_dir / "sample_statistics.csv", "w", newline="") as f:
                w = _csv.writer(f)
                w.writerow(["Sample Index", "Residuals (abs)"])
                for i, r in enumerate(res_b):
                    w.writerow([i, r])
                w.writerow(["Mean", np.nanmean(res_b)])
            # Intermediate saves skip optimizer state (halves the
            # device->host checkpoint pull on tunneled chips); final and
            # SIGTERM saves stay full so --resume restores exactly.
            save_checkpoint(
                out_dir / "model", it,
                params=state.params, ema_params=state.ema_params,
                opt_state=state.opt_state if it == cfg.train_iterations else None,
                config=dataclasses.asdict(cfg),
            )
            print(f"it {it}: sampled, residual mean {np.nanmean(res_b):.3e}")

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
    main()
