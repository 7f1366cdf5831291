"""Ancestral (DDPM) and DDIM sampling as jit-compiled ``lax.scan`` loops.

TPU-native re-design of the reference's Python sampling loops
(`/root/reference/src/denoising_utils.py:388-545,712-788` and
`denoising_toy_utils.py:199-363`):

* the T-step ancestral loop is a single ``lax.scan`` compiled once —
  history is accumulated on-device as stacked scan outputs and transferred
  to host once at the end (the reference moves every step to CPU inside the
  loop, `denoising_utils.py:531-532`);
* CoCoGen-style residual gradient corrections (arXiv 2312.10527) are a
  ``lax.cond`` inside the scan for the last N steps plus a static loop of M
  post-steps (`denoising_utils.py:519-540`);
* the per-sample-time-ladder DDIM x0 estimator used *inside* the training
  loss (x0_estimation='sample') is a fixed-length masked scan of
  ddim_steps+2 model calls, differentiable end-to-end.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.diffusion.schedule import (
    DiffusionSchedule,
    extract,
    posterior_mean,
    predict_noise_from_mean,
    predict_start_from_noise,
)

DYNAMIC_THRESHOLD_PERCENTILE = 0.9


def dynamic_threshold(x: jax.Array, percentile: float = DYNAMIC_THRESHOLD_PERCENTILE):
    """Imagen-style dynamic thresholding (`denoising_utils.py:461-473`)."""
    batch = x.shape[0]
    s = jnp.quantile(jnp.abs(x.reshape(batch, -1)), percentile, axis=-1)
    s = jnp.maximum(s, 1.0).reshape(batch, *((1,) * (x.ndim - 1)))
    return jnp.clip(x, -s, s) / s


def _derive_x0_eps_mean(sched, denoise_fn, x, t, pred_mode):
    """One model call; return (x0_pred, posterior mean, model_out)."""
    model_out = denoise_fn(x, t)
    if pred_mode == "x0":
        x0_pred = model_out
        mean = posterior_mean(sched, x0_pred, x, t)
    elif pred_mode == "eps":
        eps_factor = (1.0 - extract(sched.alphas, t, x.ndim)) / extract(
            sched.one_minus_alphas_bar_sqrt, t, x.ndim
        )
        mean = extract(sched.sqrt_recip_alphas, t, x.ndim) * (x - eps_factor * model_out)
        x0_pred = predict_start_from_noise(sched, x, t, model_out)
    elif pred_mode == "mu":
        mean = model_out
        eps_theta = predict_noise_from_mean(sched, x, t, model_out)
        x0_pred = predict_start_from_noise(sched, x, t, eps_theta)
    else:
        raise ValueError(f"Unknown pred_mode: {pred_mode!r}")
    return x0_pred, mean, model_out


def p_sample_step(
    sched: DiffusionSchedule,
    denoise_fn: Callable,
    x: jax.Array,
    t: jax.Array,
    key: jax.Array,
    *,
    pred_mode: str = "x0",
    suppress_noise: bool = True,
    use_dynamic_threshold: bool = False,
    x0_correction_fn: Optional[Callable] = None,
    xt_correction_fn: Optional[Callable] = None,
):
    """One ancestral step x_t -> x_{t-1} (`denoising_utils.py:388-473`).

    ``t`` is a scalar (or [B]) timestep. ``x0_correction_fn``/``xt_correction_fn``
    (x -> x_corrected) implement the CoCoGen corrections on the x0 prediction
    / on the sampled x_t respectively; pass None to disable.
    Returns (x_next, x0_pred, model_out).
    """
    tb = jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],))
    x0_pred, mean, model_out = _derive_x0_eps_mean(sched, denoise_fn, x, tb, pred_mode)

    if x0_correction_fn is not None:
        x0_pred = x0_correction_fn(x0_pred).astype(x0_pred.dtype)
        mean = posterior_mean(sched, x0_pred, x, tb)

    z = jax.random.normal(key, x.shape, x.dtype)
    sigma_t = jnp.sqrt(extract(sched.betas, tb, x.ndim))
    if suppress_noise:
        nonzero_mask = (tb != 0).astype(x.dtype).reshape(-1, *((1,) * (x.ndim - 1)))
    else:
        nonzero_mask = jnp.ones((), x.dtype)
    sample = mean + nonzero_mask * sigma_t * z

    if xt_correction_fn is not None:
        sample = xt_correction_fn(sample).astype(sample.dtype)

    if use_dynamic_threshold:
        sample = dynamic_threshold(sample)

    return sample, x0_pred, model_out


class SampleResult(NamedTuple):
    """Result of a full reverse-diffusion run.

    x:          [B, ...] final sample (t=0).
    x0_pred:    [B, ...] final model x0 prediction (== x when noise suppressed).
    history:    optional [T, B, ...] per-step samples (x_{T-1} ... x_0).
    x0_history: optional [T, B, ...] per-step model x0 predictions.
    """

    x: jax.Array
    x0_pred: jax.Array
    history: Optional[jax.Array] = None
    x0_history: Optional[jax.Array] = None


def p_sample_loop(
    sched: DiffusionSchedule,
    denoise_fn: Callable,
    shape: tuple,
    key: jax.Array,
    *,
    pred_mode: str = "x0",
    suppress_noise: bool = True,
    use_dynamic_threshold: bool = False,
    save_history: bool = False,
    correction_fn: Optional[Callable] = None,
    correction_mode: str = "none",
    n_correction: int = 0,
    m_correction: int = 0,
    x_init: Optional[jax.Array] = None,
) -> SampleResult:
    """Full T-step ancestral sampling as one ``lax.scan``
    (`denoising_utils.py:494-545`).

    ``correction_fn`` (x -> x_corrected) is the CoCoGen residual correction;
    it is applied inside the last ``n_correction`` steps on the x0 prediction
    (mode 'x0') or on the sampled state (mode 'xt'), and ``m_correction``
    more times after the loop (`denoising_utils.py:519-540`).

    The scan carries (x, key); history is accumulated as stacked scan
    outputs on-device (single host transfer at the end if desired).
    """
    T = sched.n_steps
    key, init_key = jax.random.split(key)
    x = x_init if x_init is not None else jax.random.normal(init_key, shape)
    x = x.astype(sched.betas.dtype)

    use_corr = correction_fn is not None and correction_mode in ("x0", "xt") and n_correction > 0

    def step(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)

        def run(x0_fn, xt_fn):
            return p_sample_step(
                sched, denoise_fn, x, t, sub,
                pred_mode=pred_mode,
                suppress_noise=suppress_noise,
                use_dynamic_threshold=use_dynamic_threshold,
                x0_correction_fn=x0_fn,
                xt_correction_fn=xt_fn,
            )

        if use_corr:
            x0_fn = correction_fn if correction_mode == "x0" else None
            xt_fn = correction_fn if correction_mode == "xt" else None
            sample, x0_pred, _ = jax.lax.cond(
                t < n_correction,
                lambda x_: run(x0_fn, xt_fn),
                lambda x_: run(None, None),
                x,
            )
        else:
            sample, x0_pred, _ = run(None, None)

        ys = (sample, x0_pred) if save_history else None
        return (sample, key), ys

    ts = jnp.arange(T - 1, -1, -1)
    (x, key), ys = jax.lax.scan(step, (x, key), ts)

    x0_pred = ys[1][-1] if save_history else x
    history = ys[0] if save_history else None
    x0_history = ys[1] if save_history else None

    for _ in range(m_correction):
        if correction_fn is None:
            raise ValueError("m_correction > 0 requires a correction_fn")
        x = correction_fn(x)

    return SampleResult(x=x, x0_pred=x0_pred, history=history, x0_history=x0_history)


def ddim_time_ladders(t: jax.Array, ddim_steps: int):
    """Per-sample descending DDIM time ladders (`denoising_utils.py:724-735`).

    For each sample with start time t_b: k = ddim_steps + 2 times evenly
    spread over [0, t_b] (integer-truncated), descending, paired with the
    next time (last pair is (0, -1)). Returns (cur_times, next_times), each
    of shape [k, B].
    """
    k = ddim_steps + 2
    t = jnp.atleast_1d(t)
    asc = jnp.floor(jnp.linspace(jnp.zeros_like(t), t.astype(jnp.float32), k)).astype(jnp.int32)
    cur = asc[::-1]
    nxt = jnp.concatenate([cur[1:], jnp.full((1, t.shape[0]), -1, jnp.int32)], axis=0)
    return cur, nxt


def ddim_sample_x0(
    sched: DiffusionSchedule,
    denoise_fn: Callable,
    x_t: jax.Array,
    t: jax.Array,
    key: jax.Array,
    *,
    ddim_steps: int = 0,
    eta: float = 0.0,
    pred_mode: str = "x0",
):
    """Estimate x0 from x_t by running a short DDIM chain down to t=0
    (`denoising_utils.py:712-788`). Differentiable — used inside the training
    loss for x0_estimation='sample'.

    Per-sample time ladders are masked fixed-length (ddim_steps + 2 model
    calls): entries where cur == next skip the update. Returns
    (x0_sample, first_model_out).
    """
    t = jnp.broadcast_to(jnp.atleast_1d(t), (x_t.shape[0],))
    cur_times, next_times = ddim_time_ladders(t, ddim_steps)

    def step(carry, times):
        cur_x, key, first_out, is_first = carry
        tc, tn = times
        key, sub = jax.random.split(key)

        model_out = denoise_fn(cur_x, tc)
        if pred_mode == "x0":
            x0_pred = model_out
            mean = posterior_mean(sched, x0_pred, cur_x, tc)
            eps_theta = predict_noise_from_mean(sched, cur_x, tc, mean)
        elif pred_mode == "eps":
            eps_theta = model_out
            x0_pred = predict_start_from_noise(sched, cur_x, tc, eps_theta)
        elif pred_mode == "mu":
            eps_theta = predict_noise_from_mean(sched, cur_x, tc, model_out)
            x0_pred = predict_start_from_noise(sched, cur_x, tc, eps_theta)
        else:
            raise ValueError(f"Unknown pred_mode: {pred_mode!r}")

        first_out = jnp.where(is_first, model_out, first_out)

        tn_safe = jnp.maximum(tn, 0)
        alpha = extract(sched.alphas_prod, tc, cur_x.ndim)
        alpha_next = extract(sched.alphas_prod, tn_safe, cur_x.ndim)
        sigma = eta * jnp.sqrt(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
        )
        c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))
        noise = jax.random.normal(sub, cur_x.shape, cur_x.dtype)
        ddim_update = x0_pred * jnp.sqrt(alpha_next) + c * eps_theta + sigma * noise

        # final ladder entry (t_next < 0): the x0 prediction itself
        tn_b = tn.reshape(-1, *((1,) * (cur_x.ndim - 1)))
        nxt = jnp.where(tn_b < 0, x0_pred, ddim_update)
        # no update where the ladder stalls (cur == next)
        stall = (tc == tn).astype(cur_x.dtype).reshape(-1, *((1,) * (cur_x.ndim - 1)))
        cur_x = stall * cur_x + (1.0 - stall) * nxt
        return (cur_x, key, first_out, jnp.zeros((), bool)), None

    init = (x_t, key, jnp.zeros_like(x_t), jnp.ones((), bool))
    (x0_sample, _, first_out, _), _ = jax.lax.scan(step, init, (cur_times, next_times))
    return x0_sample, first_out
