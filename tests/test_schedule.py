"""Schedule tables: golden parity with the reference + closed-form checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.diffusion import (
    create_schedule,
    extract,
    make_beta_schedule,
    predict_noise_from_mean,
    predict_start_from_noise,
    q_sample,
)

# schedule fields -> reference diff_dict keys
FIELD_MAP = {
    "betas": "betas",
    "alphas": "alphas",
    "sqrt_recip_alphas": "sqrt_recip_alphas",
    "alphas_prod": "alphas_prod",
    "alphas_bar_sqrt": "alphas_bar_sqrt",
    "sqrt_recip_alphas_cumprod": "sqrt_recip_alphas_cumprod",
    "sqrt_recipm1_alphas_cumprod": "sqrt_recipm1_alphas_cumprod",
    "one_minus_alphas_bar_sqrt": "one_minus_alphas_bar_sqrt",
    "alphas_prod_prev": "alphas_prod_prev",
    "posterior_mean_coef1": "posterior_mean_coef1",
    "posterior_mean_coef2": "posterior_mean_coef2",
    "noise_mean_coeff": "noise_mean_coeff",
    "posterior_variance": "posterior_variance",
    "posterior_variance_clipped": "posterior_variance_clipped",
    "posterior_log_variance_clipped": "posterior_log_variance_clipped",
    "p2_loss_weight": "p2_loss_weight",
}


@pytest.fixture(scope="module")
def sched():
    return create_schedule(100)


def test_golden_parity_all_tables(sched, golden_diff_dict):
    for field, ref_key in FIELD_MAP.items():
        ours = np.asarray(getattr(sched, field))
        ref = golden_diff_dict[ref_key]
        np.testing.assert_allclose(
            ours, ref, rtol=2e-5, atol=1e-6, err_msg=f"table {field}"
        )


def test_cosine_betas_properties(sched):
    betas = np.asarray(sched.betas)
    assert betas.shape == (100,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    assert (np.diff(np.asarray(sched.alphas_prod)) < 0).all()  # strictly decreasing


def test_other_beta_schedules():
    for name in ("linear", "quad"):
        b = make_beta_schedule(name, 50, 1e-5, 1e-2)
        assert b.shape == (50,)
        assert b[0] == pytest.approx(1e-5, rel=1e-6)
        assert b[-1] == pytest.approx(1e-2, rel=1e-6)
    # sigmoid: betas = sigmoid(linspace(-6,6)) * (end-start) + start
    b = make_beta_schedule("sigmoid", 50, 1e-5, 1e-2)
    x = np.linspace(-6, 6, 50)
    np.testing.assert_allclose(b, 1 / (1 + np.exp(-x)) * (1e-2 - 1e-5) + 1e-5)


def test_posterior_variance_clip(sched):
    pv = np.asarray(sched.posterior_variance)
    pvc = np.asarray(sched.posterior_variance_clipped)
    assert pv[0] == 0.0
    assert pvc[0] == pv[1]
    np.testing.assert_array_equal(pv[1:], pvc[1:])


def test_p2_weight_is_min_snr_5(sched):
    ap = np.asarray(sched.alphas_prod, dtype=np.float64)
    snr = ap / (1 - ap)
    np.testing.assert_allclose(
        np.asarray(sched.p2_loss_weight), np.minimum(snr, 5.0), rtol=1e-5
    )


def test_extract_shapes(sched):
    t = jnp.array([0, 5, 99])
    out = extract(sched.betas, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(out.squeeze(), np.asarray(sched.betas)[[0, 5, 99]])


def test_q_sample_golden(sched, golden_ops):
    got = q_sample(
        sched,
        jnp.asarray(golden_ops["x_t"]),
        jnp.asarray(golden_ops["t"]),
        jnp.asarray(golden_ops["noise"]),
    )
    np.testing.assert_allclose(got, golden_ops["q_sample"], rtol=1e-5, atol=1e-6)


def test_predict_start_from_noise_golden(sched, golden_ops):
    got = predict_start_from_noise(
        sched,
        jnp.asarray(golden_ops["x_t"]),
        jnp.asarray(golden_ops["t"]),
        jnp.asarray(golden_ops["noise"]),
    )
    np.testing.assert_allclose(got, golden_ops["x0_from_noise"], rtol=2e-4, atol=2e-4)


def test_predict_noise_from_mean_golden(sched, golden_ops):
    got = predict_noise_from_mean(
        sched,
        jnp.asarray(golden_ops["x_t"]),
        jnp.asarray(golden_ops["t"]),
        jnp.asarray(golden_ops["mean_t"]),
    )
    np.testing.assert_allclose(got, golden_ops["eps_from_mean"], rtol=2e-4, atol=2e-4)


def test_noising_roundtrip(sched):
    """predict_start_from_noise inverts q_sample exactly."""
    import jax

    key = jax.random.key(0)
    x0 = jax.random.normal(key, (8, 3))
    noise = jax.random.normal(jax.random.key(1), (8, 3))
    t = jnp.arange(8) * 12
    x_t = q_sample(sched, x0, t, noise)
    x0_rec = predict_start_from_noise(sched, x_t, t, noise)
    np.testing.assert_allclose(x0_rec, x0, rtol=1e-3, atol=1e-4)


def test_config_from_model_yaml(tmp_path):
    """Reference-format model.yaml configures a run 1:1 (model.yaml:1-13)."""
    from physicsinformeddiffusionmodels_tpu.config import RunConfig

    y = tmp_path / "model.yaml"
    y.write_text(
        "c_data: 1\nc_residual: 0.001\nc_ineq: 0\nlambda_opt: 0\n"
        "diff_steps: 100\nx0_estimation: 'sample'\nddim_steps: 3\n"
        "residual_grad_guidance: False\ncorrection_mode: xt\n"
        "M_correction: 2\nN_correction: 1\ngov_eqs: darcy\nfd_acc: 2\n"
    )
    cfg = RunConfig.from_model_yaml(y, name="t")
    assert cfg.ddim_steps == 3 and cfg.use_ddim_x0
    assert cfg.train_batch_size == 16  # sample-estimation halves the batch
    assert cfg.correction_mode == "xt" and cfg.N_correction == 1

    y.write_text("not_a_key: 1\n")
    import pytest

    with pytest.raises(ValueError):
        RunConfig.from_model_yaml(y)
