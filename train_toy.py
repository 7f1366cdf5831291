"""Toy study driver (2D points on the unit circle, Appendix F.1).

TPU-native equivalent of the reference's `main_toy.py`: trains a conditional
MLP denoiser with the physics-informed diffusion loss (data + residual +
inequality + optimization terms), all three model prediction modes
(x0/eps/mu), mean- or DDIM-sample x0 estimation, periodic sampling with
scatter-panel dumps, and a structured checkpoint at the end.

Runs on CPU or a single TPU chip in a couple of minutes:
    python train_toy.py [--pred-mode x0] [--x0-estimation mean|sample]
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

from physicsinformeddiffusionmodels_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from physicsinformeddiffusionmodels_tpu.diffusion import (
    LossWeights,
    TOY_LL_CLAMP,
    antithetic_timesteps,
    create_schedule,
    ddim_sample_x0,
    p_sample_loop,
    pidm_loss,
)
from physicsinformeddiffusionmodels_tpu.models.toy import ConditionalModel
from physicsinformeddiffusionmodels_tpu.physics.toy import (
    build_toy_constraint,
    hypersphere_residual,
    sample_hypersphere,
)
from physicsinformeddiffusionmodels_tpu.training import (
    MetricsLogger,
    create_train_state,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)
from physicsinformeddiffusionmodels_tpu.utils import viz


def default_config() -> dict:
    """Mirror of the reference toy config (`main_toy.py:12-34`)."""
    return {
        "name": "run_1",
        "x0_estimation": "sample",  # 'mean' or 'sample'
        "reduced_ddim_steps": 0,
        "model_pred_mode": "x0",  # 'x0', 'eps', 'mu'
        "c_data": 1.0,
        "c_residual": 0.005,  # 0.1 for mean estimation, 0.005 for sample
        "c_ineq": 0.0,
        "lambda_opt": 0.0,
        "true_randomness": False,
        "dim": 2,
        "n_steps": 100,
        "use_dynamic_threshold": False,
        "train_num_steps": 400,  # epochs over the 10^4-point dataset
        "batch_size": 128,
        "no_samples": 1000,
        "sample_freq": 10,
        "tot_eval_steps": 11,
        "fix_axes": True,
        "save_output": True,
        "create_gif": False,
        "wandb_track": False,
        "lr": 5e-4,
        "seed": 0,
        # serializable constraint spec (registry name + kwargs) — replaces
        # the reference's dill-pickled constraint modules
        # (`denoising_toy_utils.py:527-592`): the spec is stored in the
        # checkpoint and the physics_fn is rebuilt from it at load time
        "constraint_spec": {"name": "hypersphere", "kwargs": {}},
    }


def build_loss_fn(model, sched, config):
    physics_fn = build_toy_constraint(config.get("constraint_spec"))
    weights = LossWeights(
        c_data=config["c_data"],
        c_residual=config["c_residual"],
        c_ineq=config["c_ineq"],
        lambda_opt=config["lambda_opt"],
    )
    pred_mode = config["model_pred_mode"]
    use_ddim = config["x0_estimation"] == "sample"
    ddim_steps = config["reduced_ddim_steps"]
    n_steps = config["n_steps"]

    def loss_fn(params, batch, key, step):
        t_key, n_key = jax.random.split(jax.random.fold_in(key, 0))
        t = antithetic_timesteps(t_key, batch.shape[0], n_steps)

        def denoise(x, tt):
            return model.apply(params, x, tt)

        sampler = None
        if use_ddim:
            # (x0_sample, first_model_out): the first chain call doubles as
            # the direct model evaluation (`denoising_utils.py:744-753`)
            def sampler(x_t, tt, k):
                return ddim_sample_x0(
                    sched, denoise, x_t, tt, k, ddim_steps=ddim_steps, pred_mode=pred_mode
                )

        return pidm_loss(
            sched,
            batch,
            t,
            n_key,
            denoise_fn=denoise,
            physics_fn=physics_fn,
            weights=weights,
            pred_mode=pred_mode,
            x0_sampler=sampler,
            ll_clamp=TOY_LL_CLAMP,
        )

    return loss_fn


def load_toy_run(model_dir):
    """Rebuild a saved toy run: model, typed params, schedule, config, and
    the constraint physics_fn reconstructed from its serialized spec.

    Equivalent of the reference's `load_model`
    (`denoising_toy_utils.py:563-592`), which restores the dill-pickled
    residual/ineq/opt modules alongside the weights — here the constraint
    comes back from the registry spec stored in the checkpoint, so a saved
    run is self-contained without executing pickled code."""
    from flax import serialization

    from physicsinformeddiffusionmodels_tpu.training import (
        latest_checkpoint,
        load_checkpoint,
    )

    path = latest_checkpoint(Path(model_dir) / "model")
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {Path(model_dir) / 'model'}")
    raw = load_checkpoint(path)
    config = json.loads((path.parent / "config.json").read_text())
    model = ConditionalModel(dim=config["dim"], n_steps=config["n_steps"])
    template = model.init(
        jax.random.key(0), jnp.zeros((1, config["dim"])), jnp.zeros((1,), jnp.int32)
    )
    params = serialization.from_state_dict(template, raw["params"])
    sched = create_schedule(config["n_steps"])
    physics_fn = build_toy_constraint(config.get("constraint_spec"))
    return model, params, sched, config, physics_fn


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default=None)
    parser.add_argument("--pred-mode", default=None, choices=["x0", "eps", "mu"])
    parser.add_argument("--x0-estimation", default=None, choices=["mean", "sample"])
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--c-residual", type=float, default=None)
    parser.add_argument("--output-dir", default="./trained_models/toy")
    parser.add_argument("--create-gif", action="store_true")
    args = parser.parse_args(argv)

    config = default_config()
    if args.name:
        config["name"] = args.name
    if args.pred_mode:
        config["model_pred_mode"] = args.pred_mode
    if args.x0_estimation:
        config["x0_estimation"] = args.x0_estimation
    if args.epochs is not None:
        config["train_num_steps"] = args.epochs
    if args.c_residual is not None:
        config["c_residual"] = args.c_residual
    if args.create_gif:
        config["create_gif"] = True
    config["use_ddim_x0"] = config["x0_estimation"] == "sample"

    out_dir = Path(args.output_dir) / config["name"]
    out_dir.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(42)
    data = jnp.asarray(sample_hypersphere(rng, 10**4, config["dim"]), jnp.float32)

    sched = create_schedule(config["n_steps"])
    model = ConditionalModel(dim=config["dim"], n_steps=config["n_steps"])
    key = jax.random.key(config["seed"])
    key, init_key = jax.random.split(key)
    params = model.init(init_key, jnp.zeros((1, config["dim"])), jnp.zeros((1,), jnp.int32))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"Number of trainable parameters: {n_params}")

    tx = make_optimizer(config["lr"], grad_clip=1.0)
    state = create_train_state(params, tx)
    # the toy reference starts EMA never (no EMA in main_toy) — train step EMA
    # is a no-op here by setting ema_start beyond the run
    train_step = make_train_step(
        build_loss_fn(model, sched, config), tx, ema_start=10**9
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def sample_fn(params, key, n):
        def denoise(x, t):
            return model.apply(params, x, t)

        return p_sample_loop(
            sched,
            denoise,
            (n, config["dim"]),
            key,
            pred_mode=config["model_pred_mode"],
            suppress_noise=True,
            use_dynamic_threshold=config["use_dynamic_threshold"],
            save_history=True,
        )

    logger = MetricsLogger(
        str(out_dir), wandb_project="pidm_toy" if config["wandb_track"] else None,
        run_name=config["name"],
    )
    eval_steps = np.linspace(0, config["n_steps"], config["tot_eval_steps"]).astype(int)

    n_data = data.shape[0]
    bs = config["batch_size"]
    t0 = time.time()
    for epoch in range(config["train_num_steps"] + 1):
        key, perm_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, n_data)
        for i in range(0, n_data - bs + 1, bs):
            batch = data[perm[i : i + bs]]
            if config["true_randomness"]:
                key, rand_key = jax.random.split(key)
                batch = jax.random.normal(rand_key, batch.shape)
            key, step_key = jax.random.split(key)
            state, aux = train_step(state, batch, step_key)

        logger.log(
            {
                "loss": aux.loss,
                "loss_data": aux.data_loss,
                "loss_residual": aux.residual_mean_abs,
                "loss_inequality": aux.ineq_mean,
                "loss_optimization": aux.opt_mean,
            },
            step=epoch,
        )

        if epoch % config["sample_freq"] == 0:
            key, s_key = jax.random.split(key)
            result = sample_fn(state.params, s_key, config["no_samples"])
            final = np.asarray(result.x)
            residual = np.abs(np.asarray(hypersphere_residual(result.x))).mean()
            logger.log({"residual_samples": residual}, step=epoch)
            print(
                f"epoch {epoch}: loss={float(aux.loss):.4f} "
                f"sample residual={residual:.4f} ({time.time()-t0:.1f}s)"
            )
            if config["save_output"]:
                history = np.concatenate(
                    [np.asarray(jax.random.normal(s_key, (1, *final.shape))), np.asarray(result.history)]
                )
                viz.save_scatter_panels(
                    history, eval_steps, str(out_dir / f"step_{epoch}.png"),
                    config["n_steps"], fix_axes=config["fix_axes"],
                )
                viz.save_csv(final, str(out_dir / "csv" / f"step_{epoch}_sample.csv"))
                if config["create_gif"]:
                    # denoising-trajectory GIF (`main_toy.py:168-176`)
                    lims = (history[-1].min() - 0.5, history[-1].max() + 0.5)
                    viz.scatter_history_to_gif(
                        history, str(out_dir / f"step_{epoch}.gif"),
                        x_lim=lims, y_lim=lims,
                    )

    save_checkpoint(
        out_dir / "model",
        config["train_num_steps"],
        params=state.params,
        ema_params=state.ema_params,
        opt_state=state.opt_state,
        config=config,
    )
    (out_dir / "config.json").write_text(json.dumps(config, indent=2))
    logger.close()
    print(f"checkpoint saved to {out_dir/'model'}")
    return state, residual


if __name__ == "__main__":
    main()
