"""Diffusion schedule tables.

Re-derivation of the DDPM schedule tables of the reference
(`/root/reference/src/denoising_utils.py:315-370` and the functional twin
`denoising_toy_utils.py:43-144`): cosine/linear/quad/sigmoid beta schedules
plus the 18 derived per-timestep tables (cumulative products, posterior
coefficients, clipped posterior variance, min-SNR-5 p2 loss weight).

All tables are computed in float64 on host at construction time and stored
as float32 ``jnp`` arrays inside a frozen pytree dataclass, so a
``DiffusionSchedule`` can be closed over by jitted functions or passed as an
argument without retracing (shapes are static, values are constants).
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

Schedule = Literal["linear", "quad", "sigmoid", "cosine"]


def make_beta_schedule(
    schedule: Schedule = "cosine",
    n_timesteps: int = 100,
    start: float = 1e-5,
    end: float = 1e-2,
) -> np.ndarray:
    """Beta schedule (host-side, float64).

    Matches the behaviour of the reference's ``make_beta_schedule``
    (`denoising_utils.py:354-370`): the cosine schedule uses s=0.008 with
    betas clipped to [0, 0.999]; start/end only affect the other schedules.
    """
    if schedule == "linear":
        betas = np.linspace(start, end, n_timesteps)
    elif schedule == "quad":
        betas = np.linspace(start**0.5, end**0.5, n_timesteps) ** 2
    elif schedule == "sigmoid":
        x = np.linspace(-6, 6, n_timesteps)
        betas = 1.0 / (1.0 + np.exp(-x)) * (end - start) + start
    elif schedule == "cosine":
        s = 0.008
        steps = n_timesteps + 1
        x = np.linspace(0, n_timesteps, steps)
        alphas_cumprod = np.cos(((x / n_timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
        betas = np.clip(betas, 0, 0.999)
    else:
        raise ValueError(f"Unknown beta schedule: {schedule!r}")
    return betas.astype(np.float64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep schedule tables, each of shape [T].

    Table definitions mirror `denoising_utils.py:315-352`; see
    ``create_schedule`` for the derivations.
    """

    betas: jax.Array
    alphas: jax.Array
    sqrt_recip_alphas: jax.Array
    alphas_prod: jax.Array
    alphas_bar_sqrt: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    one_minus_alphas_bar_sqrt: jax.Array
    alphas_prod_prev: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    noise_mean_coeff: jax.Array
    posterior_variance: jax.Array
    posterior_variance_clipped: jax.Array
    posterior_log_variance_clipped: jax.Array
    p2_loss_weight: jax.Array

    @property
    def n_steps(self) -> int:
        return self.betas.shape[0]


def create_schedule(
    n_steps: int,
    schedule: Schedule = "cosine",
    start: float = 1e-5,
    end: float = 1e-2,
    p2_mode: Literal["min_snr", "constant_p2"] = "min_snr",
    min_snr_gamma: float = 5.0,
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Build the full table set from a beta schedule.

    Derivations (reference `denoising_utils.py:315-352`):
      alphas              = 1 - betas
      alphas_prod         = cumprod(alphas)
      alphas_prod_prev    = [1, alphas_prod[:-1]]
      posterior_mean_coef1 = betas * sqrt(alphas_prod_prev) / (1 - alphas_prod)
      posterior_mean_coef2 = (1 - alphas_prod_prev) * sqrt(alphas) / (1 - alphas_prod)
      noise_mean_coeff    = sqrt(1/alphas) * (1 - alphas) / sqrt(1 - alphas_prod)
      posterior_variance  = betas * (1 - alphas_prod_prev) / (1 - alphas_prod)
      posterior_variance_clipped[0] = posterior_variance[1]
      p2_loss_weight      = min(snr, gamma)  with snr = alphas_prod/(1-alphas_prod)
                            (min-SNR weighting, arXiv 2303.09556), or the
                            constant-p2 variant (arXiv 2204.00227).
    """
    betas = make_beta_schedule(schedule, n_steps, start, end)
    alphas = 1.0 - betas
    alphas_prod = np.cumprod(alphas)
    alphas_prod_prev = np.concatenate([[1.0], alphas_prod[:-1]])

    posterior_variance = betas * (1.0 - alphas_prod_prev) / (1.0 - alphas_prod)
    posterior_variance_clipped = posterior_variance.copy()
    posterior_variance_clipped[0] = posterior_variance[1]

    snr = alphas_prod / (1.0 - alphas_prod)
    if p2_mode == "min_snr":
        p2_loss_weight = np.minimum(snr, min_snr_gamma)
    elif p2_mode == "constant_p2":
        p2_loss_weight = (1.0 + snr) ** -1.0
    else:
        raise ValueError(f"Unknown p2 mode: {p2_mode!r}")

    as_dtype = lambda x: jnp.asarray(x, dtype=dtype)
    return DiffusionSchedule(
        betas=as_dtype(betas),
        alphas=as_dtype(alphas),
        sqrt_recip_alphas=as_dtype(np.sqrt(1.0 / alphas)),
        alphas_prod=as_dtype(alphas_prod),
        alphas_bar_sqrt=as_dtype(np.sqrt(alphas_prod)),
        sqrt_recip_alphas_cumprod=as_dtype(np.sqrt(1.0 / alphas_prod)),
        sqrt_recipm1_alphas_cumprod=as_dtype(np.sqrt(1.0 / alphas_prod - 1.0)),
        one_minus_alphas_bar_sqrt=as_dtype(np.sqrt(1.0 - alphas_prod)),
        alphas_prod_prev=as_dtype(alphas_prod_prev),
        posterior_mean_coef1=as_dtype(betas * np.sqrt(alphas_prod_prev) / (1.0 - alphas_prod)),
        posterior_mean_coef2=as_dtype((1.0 - alphas_prod_prev) * np.sqrt(alphas) / (1.0 - alphas_prod)),
        noise_mean_coeff=as_dtype(np.sqrt(1.0 / alphas) * (1.0 - alphas) / np.sqrt(1.0 - alphas_prod)),
        posterior_variance=as_dtype(posterior_variance),
        posterior_variance_clipped=as_dtype(posterior_variance_clipped),
        posterior_log_variance_clipped=as_dtype(np.log(posterior_variance_clipped)),
        p2_loss_weight=as_dtype(p2_loss_weight),
    )


def extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-sample coefficients and broadcast to an ndim-rank tensor.

    ``table`` has shape [T]; ``t`` has shape [B] (or scalar). Returns shape
    [B, 1, ..., 1] with ``ndim`` total dims, ready to multiply a [B, ...]
    tensor. TPU-friendly: a single gather, no host sync.
    (Equivalent of the reference's ``extract``, `denoising_utils.py:302-306`.)
    """
    t = jnp.atleast_1d(t)
    out = table[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def q_sample(
    sched: DiffusionSchedule,
    x0: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Forward-noising x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps.

    (`denoising_utils.py:373-378`.)
    """
    a = extract(sched.alphas_bar_sqrt, t, x0.ndim)
    am1 = extract(sched.one_minus_alphas_bar_sqrt, t, x0.ndim)
    return a * x0 + am1 * noise


def predict_start_from_noise(sched, x_t, t, noise):
    """x0-hat from eps prediction (`denoising_utils.py:560-564`)."""
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def predict_noise_from_start(sched, x_t, t, x0):
    """eps-hat from x0 prediction (`denoising_utils.py:566-569`)."""
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def predict_noise_from_mean(sched, x_t, t, mean_t):
    """eps-hat from posterior-mean prediction (`denoising_utils.py:571-574`)."""
    return (
        extract(sched.sqrt_recip_alphas, t, x_t.ndim) * x_t - mean_t
    ) / extract(sched.noise_mean_coeff, t, x_t.ndim)


def posterior_mean(sched, x0_pred, x_t, t):
    """q(x_{t-1} | x_t, x0) mean (`denoising_utils.py:441-444`)."""
    return (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x0_pred
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
