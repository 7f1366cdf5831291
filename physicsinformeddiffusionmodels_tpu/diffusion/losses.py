"""Physics-informed diffusion training losses.

Functional re-design of the reference's loss path
(`/root/reference/src/denoising_utils.py:616-710` and the toy twin
`denoising_toy_utils.py:436-511`). On top of the standard DDPM data loss the
total loss adds, per minibatch, a *virtual residual log-likelihood*
``-log p(r=0 | x0_pred)`` where ``r`` is a PDE/FEM residual evaluated on the
model's x0 prediction, plus optional inequality- and optimization-objective
likelihoods.

Design: the diffusion engine never owns the model. Callers pass
  * ``denoise_fn(x_t, t) -> model_out``   — raw network output, and
  * ``physics_fn(x0_pred) -> PhysicsTerms`` — residual (+ optional terms),
and this module composes them into a single differentiable scalar, so
``jax.grad`` flows end-to-end through the residual, the FD stencils and the
denoiser (the reference realises the same coupling via an
inversion-of-control callback, `denoising_utils.py:659-664`).

All functions are pure and jit/vmap/pjit-compatible (static shapes, no
Python control flow on traced values).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Literal, NamedTuple, Optional

import jax
import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.diffusion import schedule as sched_lib
from physicsinformeddiffusionmodels_tpu.diffusion.schedule import (
    DiffusionSchedule,
    extract,
    predict_noise_from_mean,
    predict_start_from_noise,
    q_sample,
)

PredMode = Literal["x0", "eps", "mu"]

# log(1e-12): the toy reference clamps log-likelihoods at -27.6310211159
# (`denoising_toy_utils.py:381`) to avoid -inf.
TOY_LL_CLAMP = -27.6310211159


class PhysicsTerms(NamedTuple):
    """Output of a physics residual evaluation on an x0 prediction.

    residual:   [B, ...] un-reduced PDE/FEM residual field.
    inequality: [B] per-sample inequality/equality constraint value, or None.
    optimizer:  [B] per-sample optimization objective (e.g. compliance), or None.
    """

    residual: Optional[jax.Array] = None
    inequality: Optional[jax.Array] = None
    optimizer: Optional[jax.Array] = None


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Loss-term weights (model.yaml keys c_data/c_residual/c_ineq/lambda_opt)."""

    c_data: float = 1.0
    c_residual: float = 0.0
    c_ineq: float = 0.0
    lambda_opt: float = 0.0


class LossAux(NamedTuple):
    """Tracking scalars matching the reference's logged quantities
    (loss, loss_data, residual_mean_abs, loss_inequality, loss_optimization;
    `main.py:168-176`)."""

    loss: jax.Array
    data_loss: jax.Array
    residual_mean_abs: jax.Array
    ineq_mean: jax.Array
    opt_mean: jax.Array


def gaussian_log_likelihood(x, means, variance, clamp: Optional[float] = None):
    """-0.5 (x-mean)^2 / var  (constant terms dropped, as in the reference
    `denoising_utils.py:554-558`). ``clamp`` floors the result (toy variant,
    `denoising_toy_utils.py:372-383`)."""
    log_probs = -0.5 * (x - means) ** 2 / variance
    if clamp is not None:
        log_probs = jnp.maximum(log_probs, clamp)
    return log_probs


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) for diagonal Gaussians (`denoising_utils.py:547-552`)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def loss_variational(
    sched: DiffusionSchedule, model_mean, x0, x_t, t, clamp: Optional[float] = None
):
    """Variational (mu-prediction) loss (`denoising_utils.py:576-614`):
    KL(q(x_{t-1}|x_t,x0) || p(x_{t-1}|x_t)) for t>0, Gaussian NLL at t=0.

    ``clamp`` floors the t=0 log-likelihood — the TOY study's
    gaussian_log_likelihood clamps unconditionally at -27.631
    (`denoising_toy_utils.py:372-383`) while the main engine's does not
    (`denoising_utils.py:554-558`); pass ll_clamp through for toy parity."""
    batch = x0.shape[0]
    true_mean = sched_lib.posterior_mean(sched, x0, x_t, t)
    true_var = extract(sched.posterior_variance_clipped, t, x_t.ndim)
    log_var = jnp.log(true_var)

    kl = normal_kl(true_mean, log_var, model_mean, log_var)
    kl = kl.reshape(batch, -1).mean(axis=1)

    ll = gaussian_log_likelihood(x0, model_mean, true_var, clamp)
    ll = ll.reshape(batch, -1).mean(axis=1)

    loss = jnp.where(t == 0, -ll, kl)
    return loss.mean()


def data_loss_x0(sched: DiffusionSchedule, x0_target, model_out, t):
    """p2-weighted per-sample-mean MSE on x0 (`denoising_utils.py:673-677`)."""
    batch = x0_target.shape[0]
    mse = ((x0_target - model_out) ** 2).reshape(batch, -1).mean(axis=1)
    return (mse * sched.p2_loss_weight[t]).mean()


def residual_log_likelihood_loss(
    sched: DiffusionSchedule,
    residual: jax.Array,
    t: jax.Array,
    clamp: Optional[float] = None,
) -> jax.Array:
    """mean of -log p(r=0 | x0_pred) with per-sample variance
    sigma_t^2 = posterior_variance_clipped[t] (`denoising_utils.py:685-692`)."""
    var = extract(sched.posterior_variance_clipped, t, residual.ndim)
    ll = gaussian_log_likelihood(jnp.zeros_like(residual), residual, var, clamp)
    return (-ll).mean()


def estimate_x0(
    sched: DiffusionSchedule,
    denoise_fn: Callable,
    x_t: jax.Array,
    t: jax.Array,
    pred_mode: PredMode = "x0",
):
    """Run the denoiser once and derive the x0 estimate from its raw output.

    Returns (x0_pred, model_out). Covers the reference's three model
    prediction modes (`denoising_toy_utils.py:452-479`); the full studies use
    pred_mode='x0' exclusively.
    """
    model_out = denoise_fn(x_t, t)
    if pred_mode == "x0":
        x0_pred = model_out
    elif pred_mode == "eps":
        x0_pred = predict_start_from_noise(sched, x_t, t, model_out)
    elif pred_mode == "mu":
        noise_pred = predict_noise_from_mean(sched, x_t, t, model_out)
        x0_pred = predict_start_from_noise(sched, x_t, t, noise_pred)
    else:
        raise ValueError(f"Unknown pred_mode: {pred_mode!r}")
    return x0_pred, model_out


def antithetic_timesteps(key: jax.Array, batch: int, n_steps: int) -> jax.Array:
    """Antithetic timestep sampling t u (T-1-t) (`denoising_toy_utils.py:440-441`)."""
    t = jax.random.randint(key, (batch // 2 + 1,), 0, n_steps)
    return jnp.concatenate([t, n_steps - t - 1])[:batch]


def uniform_timesteps(key: jax.Array, batch: int, n_steps: int) -> jax.Array:
    """Uniform timestep sampling (`denoising_utils.py:625`)."""
    return jax.random.randint(key, (batch,), 0, n_steps)


def pidm_loss(
    sched: DiffusionSchedule,
    x0: jax.Array,
    t: jax.Array,
    key: jax.Array,
    *,
    denoise_fn: Callable,
    physics_fn: Optional[Callable[[jax.Array], PhysicsTerms]] = None,
    weights: LossWeights,
    pred_mode: PredMode = "x0",
    x0_sampler: Optional[Callable] = None,
    ll_clamp: Optional[float] = None,
    model_out_transform: Optional[Callable] = None,
    noise: Optional[jax.Array] = None,
) -> tuple[jax.Array, LossAux]:
    """Full physics-informed diffusion loss (one minibatch).

    Equivalent of the reference's ``model_estimation_loss``
    (`denoising_utils.py:616-710`, toy `denoising_toy_utils.py:436-511`):

      loss = c_data * L_data(model_out, x0)
           + c_residual * mean(-log p(r=0 | x0_est))           [var=sigma_t^2]
           + c_ineq     * mean(-log p(ineq=0 | x0_est))        [var=sigma_t^2]
           + lambda_opt * mean(optimizer)                      [Expon. log-lik]

    Args:
      denoise_fn: (x_t, t) -> raw model output (closes over params + cond).
        Not invoked when ``x0_sampler`` is given (the chain's first model
        output substitutes for it — see below).
      physics_fn: x0_est -> PhysicsTerms (closes over cond).
      x0_sampler: optional (x_t, t, key) -> (x0_sample, first_model_out) via
        the DDIM chain (x0_estimation='sample' mode,
        `denoising_utils.py:128-129`). When given, the residual is evaluated
        on x0_sample while the data loss targets first_model_out — the
        chain's first model call IS the direct model evaluation at (x_t, t),
        so no separate call is made (reference reuses it the same way,
        `denoising_utils.py:744-753`).
      ll_clamp: floor for log-likelihood terms (toy study uses TOY_LL_CLAMP).
      model_out_transform: optional map applied to the raw model output
        before the data loss — the mechanics study compares in the 65x65
        node layout (displacements upsampled, rho padded;
        `residuals_mechanics_K.py:245-255`) while the physics terms take the
        raw 64x64 prediction.

    Note: the reference evaluates the inequality likelihood against a
    variance tensor shaped for the *residual*, which broadcasts a [B] ineq
    against [B,1] variances into a [B,B] matrix (`denoising_utils.py:697`).
    We use the per-sample variance elementwise instead — same expectation,
    per-sample-correct weighting.
    """
    if noise is None:
        noise = jax.random.normal(key, x0.shape, x0.dtype)
    x_t = q_sample(sched, x0, t, noise)

    # x0 estimate the physics terms are evaluated on: either the direct
    # prediction (x0_estimation='mean') or a DDIM-sampled x0, whose first
    # model call doubles as the direct prediction (one fewer model call).
    if x0_sampler is not None:
        key, sub = jax.random.split(key)
        x0_est, model_out = x0_sampler(x_t, t, sub)
    else:
        x0_est, model_out = estimate_x0(sched, denoise_fn, x_t, t, pred_mode)
    if model_out_transform is not None:
        model_out = model_out_transform(model_out)

    if pred_mode == "x0":
        data_loss = data_loss_x0(sched, x0, model_out, t)
    elif pred_mode == "eps":
        data_loss = ((noise - model_out) ** 2).mean()
    elif pred_mode == "mu":
        data_loss = loss_variational(sched, model_out, x0, x_t, t, clamp=ll_clamp)
    else:
        raise ValueError(f"Unknown pred_mode: {pred_mode!r}")

    loss = weights.c_data * data_loss
    data_loss_track = weights.c_data * data_loss

    # physics_fn=None -> vanilla DDPM (data loss only)
    terms = physics_fn(x0_est) if physics_fn is not None else PhysicsTerms()
    residual = terms.residual

    residual_track = jnp.zeros((), x0.dtype)
    if residual is not None:
        loss = loss + weights.c_residual * residual_log_likelihood_loss(
            sched, residual, t, clamp=ll_clamp
        )
        residual_track = jnp.abs(residual).mean()

    ineq_track = jnp.zeros((), x0.dtype)
    if terms.inequality is not None:
        var_b = sched.posterior_variance_clipped[t]
        ineq_ll = gaussian_log_likelihood(
            jnp.zeros_like(terms.inequality), terms.inequality, var_b, ll_clamp
        )
        loss = loss + weights.c_ineq * (-ineq_ll).mean()
        ineq_track = terms.inequality.mean()

    opt_track = jnp.zeros((), x0.dtype)
    if terms.optimizer is not None:
        # log p(c=c_min | x0_est) under an exponential distribution
        # reduces to -lambda_opt * c (`denoising_utils.py:703-708`).
        loss = loss + weights.lambda_opt * terms.optimizer.mean()
        opt_track = terms.optimizer.mean()

    aux = LossAux(
        loss=loss,
        data_loss=data_loss_track,
        residual_mean_abs=residual_track,
        ineq_mean=ineq_track,
        opt_mean=opt_track,
    )
    return loss, aux
