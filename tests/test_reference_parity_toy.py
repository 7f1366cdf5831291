"""Toy-twin EXECUTION parity vs the torch reference.

Runs the reference's `src.denoising_toy_utils` (torch, via refbridge) on
pinned RNG against the framework on identical inputs:

- `model_estimation_loss` for all three pred modes (x0/eps/mu), mean and
  DDIM-sample estimation, with the toy constraint stack (residual +
  inequality + optimization) and the -27.631 log-likelihood clamp
  (`denoising_toy_utils.py:436-511`),
- the toy DDIM's CHAINED-input semantics (`denoising_toy_utils.py:290-363`
  — cur_x advances through the ladder, unlike the main study's fixed-input
  re-query),
- single ancestral `p_sample` steps incl. dynamic thresholding
  (`denoising_toy_utils.py:199-264`),
- the antithetic timestep construction (`denoising_toy_utils.py:440-441`).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import refbridge  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason="reference checkout not mounted"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from physicsinformeddiffusionmodels_tpu.diffusion import (  # noqa: E402
    LossWeights,
    TOY_LL_CLAMP,
    antithetic_timesteps,
    create_schedule,
    ddim_sample_x0,
    pidm_loss,
)
from physicsinformeddiffusionmodels_tpu.diffusion.sampling import (  # noqa: E402
    p_sample_step,
)
from physicsinformeddiffusionmodels_tpu.physics.toy import toy_physics  # noqa: E402


@pytest.fixture(scope="module")
def ref_toy():
    return refbridge.import_reference("src.denoising_toy_utils")


@pytest.fixture(scope="module")
def diff_dict(ref_toy):
    return ref_toy.create_diff_dict(100, "cpu")


def _torch_constraints(ref_toy):
    """The reference toy constraint modules, verbatim formulations
    (`main_toy.py:51-82`)."""
    import torch
    import torch.nn as nn

    class ResidualFunc(nn.Module):
        def forward(self, x):
            return torch.sum(x**2, dim=1) - 1.0

    class InequalityFunc(nn.Module):
        def forward(self, x):
            density = torch.sum(torch.abs(x), dim=1)
            return torch.nn.functional.relu(density - 1.0), density

    class OptimizationFunc(nn.Module):
        def forward(self, x):
            return x[:, 0]

    return ResidualFunc(), InequalityFunc(), OptimizationFunc()


def _dummy_models():
    """Deterministic affine 'denoiser' shared across frameworks."""
    import torch

    class Dummy(torch.nn.Module):
        def forward(self, x, t):
            return 0.5 * x + 0.1

    return Dummy(), (lambda x, t: 0.5 * x + 0.1)


def _pin_torch_rng(monkeypatch, t_np=None, noise_np=None):
    import torch

    if t_np is not None:
        t_t = torch.tensor(t_np, dtype=torch.long)
        monkeypatch.setattr(torch, "randint", lambda *a, **k: t_t)
    if noise_np is not None:
        noise_t = torch.tensor(noise_np)
        real = torch.randn_like

        def fake(x, **k):
            if x.shape == noise_t.shape:
                return noise_t.to(x.dtype)
            return real(x, **k)

        monkeypatch.setattr(torch, "randn_like", fake)


class TestToyLossParity:
    B = 8

    @pytest.mark.parametrize("pred_mode", ["x0", "eps", "mu"])
    @pytest.mark.parametrize("use_ddim", [False, True])
    def test_model_estimation_loss(
        self, ref_toy, diff_dict, monkeypatch, pred_mode, use_ddim
    ):
        import torch

        B = self.B
        rng = np.random.default_rng(5)
        x0 = (rng.normal(size=(B, 2)) / np.linalg.norm(
            rng.normal(size=(B, 2)), axis=1, keepdims=True
        )).astype(np.float32)
        # antithetic halves exactly as the reference constructs them
        t_half = np.array([3, 20, 60, 99, 0])
        t_np = np.concatenate([t_half, 100 - t_half - 1])[:B]
        noise = rng.normal(size=(B, 2)).astype(np.float32)

        model_t, denoise_j = _dummy_models()
        res_f, ineq_f, opt_f = _torch_constraints(ref_toy)
        _pin_torch_rng(monkeypatch, t_half, noise)

        loss_t, data_t, res_t, ineq_t, opt_t = ref_toy.model_estimation_loss(
            model_t, torch.tensor(x0), 100, diff_dict,
            model_pred_mode=pred_mode,
            residual_func=res_f, ineq_func=ineq_f, opt_func=opt_f,
            c_data=1.0, c_residual=0.005, c_ineq=0.01, lambda_opt=1e-3,
            use_ddim_x0=use_ddim, reduced_ddim_steps=2,
        )

        sched = create_schedule(100)
        sampler = None
        if use_ddim:
            # toy semantics: the DDIM chain ADVANCES cur_x through the
            # ladder (`denoising_toy_utils.py:324-340`) — denoise_fn sees
            # the chained state, unlike the main study's fixed re-query
            def sampler(x_t, tt, k):
                return ddim_sample_x0(
                    sched, denoise_j, x_t, tt, k, ddim_steps=2,
                    pred_mode=pred_mode,
                )

        loss_j, aux = pidm_loss(
            sched, jnp.asarray(x0), jnp.asarray(t_np), jax.random.key(0),
            denoise_fn=denoise_j,
            physics_fn=toy_physics,
            weights=LossWeights(
                c_data=1.0, c_residual=0.005, c_ineq=0.01, lambda_opt=1e-3
            ),
            pred_mode=pred_mode,
            x0_sampler=sampler,
            ll_clamp=TOY_LL_CLAMP,
            noise=jnp.asarray(noise),
        )

        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-4, abs=1e-6)
        # reference quirk: `data_loss = loss` aliases the tensor that the
        # subsequent `loss += residual_loss` updates IN-PLACE, so the toy
        # reference's returned data_loss equals its total loss
        # (`denoising_toy_utils.py:485-510`); the framework tracks the true
        # data component — verify the aliasing identity and the component sum
        assert float(data_t) == pytest.approx(float(loss_t), rel=1e-6)
        assert float(aux.data_loss) <= float(loss_j) + 1e-6
        assert float(aux.residual_mean_abs) == pytest.approx(
            float(res_t), rel=1e-4, abs=1e-6
        )
        assert float(aux.ineq_mean) == pytest.approx(float(ineq_t), rel=1e-4, abs=1e-6)
        assert float(aux.opt_mean) == pytest.approx(float(opt_t), rel=1e-4, abs=1e-6)

    def test_ll_clamp_binds(self, ref_toy, diff_dict, monkeypatch):
        """Force the -27.631 clamp to bind (huge residual at tiny t where
        posterior variance is clipped small) and check both sides agree —
        i.e. the clamp value AND its placement match."""
        import torch

        B = 4
        # x0 far off the unit circle -> residual ~ 99 -> ll floor engaged
        x0 = np.full((B, 2), 5.0, np.float32)
        t_half = np.array([1, 2, 0])
        t_np = np.concatenate([t_half, 100 - t_half - 1])[:B]
        noise = np.zeros((B, 2), np.float32)

        model_t, denoise_j = _dummy_models()
        res_f, ineq_f, opt_f = _torch_constraints(ref_toy)
        _pin_torch_rng(monkeypatch, t_half, noise)

        loss_t, *_ = ref_toy.model_estimation_loss(
            model_t, torch.tensor(x0), 100, diff_dict,
            model_pred_mode="x0",
            residual_func=res_f, ineq_func=ineq_f, opt_func=opt_f,
            c_data=1.0, c_residual=1.0, c_ineq=0.0, lambda_opt=0.0,
        )
        sched = create_schedule(100)
        loss_j, _ = pidm_loss(
            sched, jnp.asarray(x0), jnp.asarray(t_np), jax.random.key(0),
            denoise_fn=denoise_j, physics_fn=toy_physics,
            weights=LossWeights(c_data=1.0, c_residual=1.0),
            pred_mode="x0", ll_clamp=TOY_LL_CLAMP,
            noise=jnp.asarray(noise),
        )
        # clamped residual term contributes exactly +27.631.. per sample
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-5)

    def test_antithetic_structure(self):
        t = np.asarray(antithetic_timesteps(jax.random.key(3), 9, 100))
        half = 9 // 2 + 1
        # second half mirrors the first: t_i + t_{i+half} == n_steps - 1
        mirrored = 100 - t[:half] - 1
        np.testing.assert_array_equal(t[half:], mirrored[: 9 - half])
        assert t.min() >= 0 and t.max() <= 99


class TestToyDDIMChainParity:
    """Chained DDIM x0 estimation head-to-head at several start times."""

    @pytest.mark.parametrize("pred_mode", ["x0", "eps", "mu"])
    def test_ddim_sample_x0(self, ref_toy, diff_dict, pred_mode):
        import torch

        B = 6
        rng = np.random.default_rng(11)
        xt = rng.normal(size=(B, 2)).astype(np.float32)
        t_np = np.array([99, 50, 7, 1, 0, 63])

        model_t, denoise_j = _dummy_models()
        out_t = ref_toy.ddim_sample_x0(
            torch.tensor(xt), torch.tensor(t_np), model_t, (B, 2), 3, 0,
            diff_dict, model_pred_mode=pred_mode,
        )
        sched = create_schedule(100)
        out_j, first_out = ddim_sample_x0(
            sched, denoise_j, jnp.asarray(xt), jnp.asarray(t_np),
            jax.random.key(0), ddim_steps=3, pred_mode=pred_mode,
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-5
        )
        # the chain's first model call is the direct evaluation at (x_t, t)
        np.testing.assert_allclose(
            np.asarray(first_out), 0.5 * xt + 0.1, rtol=1e-5, atol=1e-6
        )


class TestToyPSampleParity:
    """Single ancestral steps with identical z, all pred modes + dynamic
    threshold."""

    @pytest.mark.parametrize("pred_mode", ["x0", "eps", "mu"])
    @pytest.mark.parametrize("dyn_thresh", [False, True])
    def test_p_sample_step(self, ref_toy, diff_dict, monkeypatch, pred_mode, dyn_thresh):
        import torch

        B = 5
        rng = np.random.default_rng(13)
        x = (3.0 * rng.normal(size=(B, 2))).astype(np.float32)
        t_scalar = 42

        # pin the torch z to the exact normal the jax step will draw
        key = jax.random.key(7)
        z = np.asarray(jax.random.normal(key, (B, 2), jnp.float32))
        _pin_torch_rng(monkeypatch, noise_np=z)

        model_t, denoise_j = _dummy_models()
        sample_t, _, _ = ref_toy.p_sample(
            model_t, torch.tensor(x), t_scalar, diff_dict,
            model_pred_mode=pred_mode, surpress_noise=True,
            use_dynamic_threshold=dyn_thresh,
        )
        sched = create_schedule(100)
        sample_j, x0_pred_j, _ = p_sample_step(
            sched, denoise_j, jnp.asarray(x), jnp.asarray(t_scalar), key,
            pred_mode=pred_mode, suppress_noise=True,
            use_dynamic_threshold=dyn_thresh,
        )
        np.testing.assert_allclose(
            np.asarray(sample_j), sample_t.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_p_sample_t0_suppresses_noise(self, ref_toy, diff_dict, monkeypatch):
        import torch

        B = 3
        x = np.asarray([[0.3, -0.2], [1.0, 0.5], [-0.7, 0.9]], np.float32)
        key = jax.random.key(9)
        z = np.asarray(jax.random.normal(key, (B, 2), jnp.float32))
        _pin_torch_rng(monkeypatch, noise_np=z)

        model_t, denoise_j = _dummy_models()
        sample_t, _, _ = ref_toy.p_sample(
            model_t, torch.tensor(x), 0, diff_dict,
            model_pred_mode="x0", surpress_noise=True,
        )
        sched = create_schedule(100)
        sample_j, _, _ = p_sample_step(
            sched, denoise_j, jnp.asarray(x), jnp.asarray(0), key,
            pred_mode="x0", suppress_noise=True,
        )
        np.testing.assert_allclose(
            np.asarray(sample_j), sample_t.numpy(), rtol=1e-5, atol=1e-6
        )
        # with noise suppressed at t=0 the step returns the posterior mean
        np.testing.assert_allclose(
            np.asarray(sample_j), 0.5 * x + 0.1, rtol=1e-4, atol=1e-5
        )
