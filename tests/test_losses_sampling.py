"""Loss terms + sampling machinery: golden parity and invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.diffusion import (
    LossWeights,
    PhysicsTerms,
    antithetic_timesteps,
    create_schedule,
    ddim_sample_x0,
    ddim_time_ladders,
    dynamic_threshold,
    gaussian_log_likelihood,
    loss_variational,
    p_sample_loop,
    pidm_loss,
)
from physicsinformeddiffusionmodels_tpu.physics.toy import toy_physics


@pytest.fixture(scope="module")
def sched():
    return create_schedule(100)


def test_gaussian_ll_golden(sched, golden_ops):
    x_t = jnp.asarray(golden_ops["x_t"])
    t = jnp.asarray(golden_ops["t"])
    var = sched.posterior_variance_clipped[t][:, None]
    # the toy reference clamps log-likelihoods at log(1e-12)
    from physicsinformeddiffusionmodels_tpu.diffusion import TOY_LL_CLAMP

    got = gaussian_log_likelihood(jnp.zeros_like(x_t), x_t, var, clamp=TOY_LL_CLAMP)
    np.testing.assert_allclose(got, golden_ops["gaussian_ll"], rtol=1e-4, atol=1e-5)


def test_loss_variational_golden(sched, golden_ops):
    got = loss_variational(
        sched,
        jnp.asarray(golden_ops["mean_t"]),
        jnp.asarray(golden_ops["x_t"]),
        jnp.asarray(golden_ops["noise"]),
        jnp.asarray(golden_ops["t"]),
    )
    np.testing.assert_allclose(got, golden_ops["loss_variational"], rtol=1e-4)


def test_ddim_time_ladders_golden(golden_ops):
    cur, nxt = ddim_time_ladders(jnp.asarray(golden_ops["t"]), ddim_steps=3)
    np.testing.assert_array_equal(np.asarray(cur), golden_ops["ddim_cur"])
    np.testing.assert_array_equal(np.asarray(nxt), golden_ops["ddim_next"])


def test_antithetic_timesteps():
    t = antithetic_timesteps(jax.random.key(0), 128, 100)
    assert t.shape == (128,)
    t = np.asarray(t)
    assert (t >= 0).all() and (t < 100).all()
    # antithetic pairing: first half and its mirror
    half = 128 // 2 + 1
    np.testing.assert_array_equal(t[half:], (100 - t[: 128 - half] - 1))


def test_dynamic_threshold():
    x = jnp.concatenate([jnp.ones((2, 99)), jnp.full((2, 1), 10.0)], axis=1)
    out = dynamic_threshold(x)
    assert np.abs(out).max() <= 1.0
    # small-magnitude input untouched (s clamps at 1)
    x_small = 0.5 * jnp.ones((2, 10))
    np.testing.assert_allclose(dynamic_threshold(x_small), x_small)


def _perfect_denoiser(sched):
    """A denoiser that predicts x0 = 0 always -> sampling contracts to 0."""

    def fn(x, t):
        return jnp.zeros_like(x)

    return fn


def test_p_sample_loop_contracts(sched):
    res = p_sample_loop(
        sched, _perfect_denoiser(sched), (16, 2), jax.random.key(0), save_history=True
    )
    assert res.x.shape == (16, 2)
    assert res.history.shape == (100, 16, 2)
    assert res.x0_history.shape == (100, 16, 2)
    # with x0_pred == 0 the final state is exactly the posterior mean at t=0 -> 0
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-5)


def test_p_sample_loop_noise_suppressed_at_t0(sched):
    """Last step must be deterministic: x_0 == posterior mean (no noise)."""

    def denoise(x, t):
        return 0.3 * x

    r1 = p_sample_loop(sched, denoise, (4, 2), jax.random.key(1), save_history=True)
    # last history entry equals final x
    np.testing.assert_allclose(np.asarray(r1.history[-1]), np.asarray(r1.x))


def test_ddim_sample_x0_identity_at_t0(sched):
    """At t=0 the ladder is all zeros -> returns the model's x0 prediction."""

    def denoise(x, t):
        return 2.0 * x

    x_t = jnp.ones((3, 2))
    t = jnp.zeros((3,), jnp.int32)
    x0, first = ddim_sample_x0(sched, denoise, x_t, t, jax.random.key(0), ddim_steps=0)
    np.testing.assert_allclose(np.asarray(x0), 2.0 * np.ones((3, 2)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(first), 2.0 * np.ones((3, 2)), rtol=1e-5)


def test_ddim_sample_x0_differentiable(sched):
    def loss(scale):
        def denoise(x, t):
            return scale * x

        x0, _ = ddim_sample_x0(
            sched,
            denoise,
            jnp.ones((2, 2)),
            jnp.array([50, 99]),
            jax.random.key(0),
            ddim_steps=2,
        )
        return jnp.sum(x0**2)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(g)


def test_pidm_loss_runs_and_differentiates(sched):
    """Full loss with all three physics terms is finite and differentiable."""

    def make_denoise(w):
        return lambda x, t: x * w

    def loss_fn(w, key):
        x0 = jax.random.normal(jax.random.key(7), (8, 2))
        t = jnp.arange(8) * 12
        loss, aux = pidm_loss(
            sched,
            x0,
            t,
            key,
            denoise_fn=make_denoise(w),
            physics_fn=toy_physics,
            weights=LossWeights(c_data=1.0, c_residual=0.1, c_ineq=0.05, lambda_opt=0.01),
            pred_mode="x0",
        )
        return loss, aux

    (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(0.5, jax.random.key(0))
    assert np.isfinite(loss) and np.isfinite(g)
    assert np.isfinite(aux.residual_mean_abs)


@pytest.mark.parametrize("pred_mode", ["x0", "eps", "mu"])
def test_pidm_loss_pred_modes(sched, pred_mode):
    def denoise(x, t):
        return 0.1 * x

    x0 = jax.random.normal(jax.random.key(3), (6, 2))
    t = jnp.array([0, 10, 30, 50, 80, 99])
    loss, aux = pidm_loss(
        sched,
        x0,
        t,
        jax.random.key(1),
        denoise_fn=denoise,
        physics_fn=lambda x: PhysicsTerms(residual=jnp.sum(x**2, axis=1) - 1.0),
        weights=LossWeights(c_residual=0.1),
        pred_mode=pred_mode,
    )
    assert np.isfinite(loss)


def test_pidm_loss_sample_estimation_mode(sched):
    """x0_estimation='sample': residual evaluated on the DDIM-sampled x0."""

    def denoise(x, t):
        return 0.1 * x

    def sampler(x_t, t, key):
        return ddim_sample_x0(sched, denoise, x_t, t, key, ddim_steps=2)

    x0 = jax.random.normal(jax.random.key(3), (4, 2))
    t = jnp.array([5, 20, 60, 99])
    loss, _ = pidm_loss(
        sched,
        x0,
        t,
        jax.random.key(1),
        denoise_fn=denoise,
        physics_fn=lambda x: PhysicsTerms(residual=jnp.sum(x**2, axis=1) - 1.0),
        weights=LossWeights(c_residual=0.005),
        x0_sampler=sampler,
    )
    assert np.isfinite(loss)
